"""Oracle-independence tests for the persistence stack.

The main oracle test (tests/test_flooder.py::test_vs_alpha) compares
Flood PH against this package's own AlphaComplex — both route through the
same SimplexTree/persistence code, so a shared persistence bug could
cancel out (the reference's oracle is the independent gudhi C++ library,
reference tests/test_flooder.py:24-75). These tests break that loop:

- gudhi cross-checks activate automatically wherever gudhi is installed
  (skipped here: the environment omits gudhi by design),
- medium-size clouds with KNOWN topology (sphere, torus) are pushed
  through flood_complex -> SimplexTree -> persistence WITHOUT touching
  AlphaComplex, and checked against ground-truth Betti numbers,
- the Euler-Poincare identity (alternating simplex count == alternating
  Betti sum) ties the reduction's bookkeeping to pure combinatorics.
"""

import numpy as np
import pytest

from flooder_tpu import flood_complex, generate_noisy_torus_points_3d
from flooder_tpu.core import generate_landmarks

try:  # soft import: the gudhi tests below skip individually
    import gudhi  # type: ignore

    HAS_GUDHI = True
except Exception:
    HAS_GUDHI = False


def _sphere_cloud(n, seed=0, r=1.0, noise=0.0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    if noise:
        v += rng.normal(0, noise, v.shape)
    return (r * v).astype(np.float32)


def _dominant(intervals, min_pers):
    fin = intervals[np.isfinite(intervals[:, 1])]
    ess = intervals[~np.isfinite(intervals[:, 1])]
    return len(ess) + int(((fin[:, 1] - fin[:, 0]) > min_pers).sum())


def test_flood_sphere_betti_numbers():
    """Flood PH of a 2-sphere sample — b0=1, b1=0, b2=1 at the dominant
    scale — computed without AlphaComplex anywhere in the pipeline."""
    pts = _sphere_cloud(4000, seed=3)
    lms = generate_landmarks(pts, 150, start_idx=0)
    st = flood_complex(pts, lms, return_simplex_tree=True)
    st.compute_persistence()
    d0 = st.persistence_intervals_in_dimension(0)
    d1 = st.persistence_intervals_in_dimension(1)
    d2 = st.persistence_intervals_in_dimension(2)
    # one essential connected component
    assert np.isinf(d0[:, 1]).sum() == 1
    # the sphere void: exactly one dominant 2-cycle
    assert _dominant(d2, 0.15) == 1
    # no dominant 1-cycles (all H1 bars are sampling noise)
    assert _dominant(d1, 0.15) == 0


def test_flood_torus_betti_numbers():
    """Flood PH of a torus-surface sample (R=3, r=1): b0=1, b1=2, b2=1."""
    pts = generate_noisy_torus_points_3d(6000, seed=5)
    lms = generate_landmarks(pts, 250, start_idx=0)
    st = flood_complex(pts, lms, return_simplex_tree=True)
    st.compute_persistence()
    d0 = st.persistence_intervals_in_dimension(0)
    d1 = st.persistence_intervals_in_dimension(1)
    d2 = st.persistence_intervals_in_dimension(2)
    assert np.isinf(d0[:, 1]).sum() == 1
    # two dominant 1-cycles (meridian dies ~r=1, longitude lives longer)
    assert _dominant(d1, 0.5) == 2
    # one dominant 2-cycle (the tube's cavity)
    assert _dominant(d2, 0.3) == 1


def test_euler_poincare_identity():
    """Alternating simplex count of the full complex must equal the
    alternating sum of its Betti numbers — a pure-bookkeeping identity
    that any pairing bug in the reduction would break."""
    pts = _sphere_cloud(1500, seed=11, noise=0.02)
    lms = generate_landmarks(pts, 120, start_idx=0)
    st = flood_complex(pts, lms, return_simplex_tree=True)
    st.compute_persistence()
    counts = {}
    for simplex, _ in st.get_simplices():
        counts[len(simplex) - 1] = counts.get(len(simplex) - 1, 0) + 1
    chi_complex = sum((-1) ** d * c for d, c in counts.items())
    betti = st.betti_numbers()
    chi_homology = sum((-1) ** d * b for d, b in enumerate(betti))
    assert chi_complex == chi_homology


def test_grid_square_flood_value_exact():
    """Witnesses = landmarks = a regular 2-D grid with spacing h: every
    Delaunay triangle is a half-square whose covering radius is h/sqrt(2)
    (the farthest point of the square's center from all four corners) —
    a hand-computable filtration value for the top-dimension simplices."""
    h = 0.25
    xs = np.arange(0.0, 1.0 + 1e-9, h, dtype=np.float32)
    gx, gy = np.meshgrid(xs, xs)
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)
    fc = flood_complex(pts, pts, points_per_edge=41)
    tri_vals = [v for s, v in fc.items() if len(s) == 3]
    expected = h / np.sqrt(2.0)
    assert len(tri_vals) == 2 * (len(xs) - 1) ** 2
    for v in tri_vals:
        assert v == pytest.approx(expected, abs=2e-4)
    # and the full grid is contractible: one essential component, no holes
    st = flood_complex(pts, pts, points_per_edge=41, return_simplex_tree=True)
    st.compute_persistence()
    assert st.betti_numbers()[:2] == [1, 0]


@pytest.mark.skipif(not HAS_GUDHI, reason="gudhi not installed")
def test_gudhi_alpha_crosscheck():
    """Our AlphaComplex vs the independent gudhi C++ implementation
    (activates wherever gudhi exists — the reference's own oracle)."""
    from flooder_tpu.topology import AlphaComplex, bottleneck_distance

    rng = np.random.default_rng(2)
    pts = rng.random((400, 2))
    st = AlphaComplex(pts).create_simplex_tree(output_squared_values=False)
    st.compute_persistence()
    gst = gudhi.AlphaComplex(points=pts).create_simplex_tree(
        output_squared_values=False
    )
    gst.compute_persistence()
    for dim in (0, 1):
        ours = st.persistence_intervals_in_dimension(dim)
        theirs = gst.persistence_intervals_in_dimension(dim)
        assert bottleneck_distance(ours, theirs) < 1e-6


@pytest.mark.skipif(not HAS_GUDHI, reason="gudhi not installed")
def test_gudhi_flood_oracle():
    """Flood PH (landmarks == witnesses) vs gudhi Alpha PH — the exact
    oracle test of the reference (tests/test_flooder.py:24-75)."""
    from flooder_tpu.topology import bottleneck_distance

    rng = np.random.default_rng(4)
    theta = rng.uniform(0, 2 * np.pi, 600)
    pts = np.stack(
        [np.cos(theta) + 0.02 * rng.normal(size=600),
         np.sin(theta) + 0.02 * rng.normal(size=600)], 1
    ).astype(np.float32)
    st = flood_complex(pts, pts, points_per_edge=60, return_simplex_tree=True)
    st.compute_persistence()
    gst = gudhi.AlphaComplex(points=pts.astype(np.float64)).create_simplex_tree(
        output_squared_values=False
    )
    gst.compute_persistence()
    for dim in (0, 1):
        ours = st.persistence_intervals_in_dimension(dim)
        theirs = gst.persistence_intervals_in_dimension(dim)
        assert bottleneck_distance(ours, theirs) < 5e-4


@pytest.mark.skipif(not HAS_GUDHI, reason="gudhi not installed")
def test_gudhi_roundtrip():
    """to_gudhi/from_gudhi preserve every simplex and filtration value
    (the reference's return type IS a gudhi SimplexTree, reference
    core.py:278-288 — this is the drop-in escape hatch)."""
    pts = generate_noisy_torus_points_3d(800, seed=3)
    st = flood_complex(
        np.asarray(pts), 60, points_per_edge=6, return_simplex_tree=True
    )
    gst = st.to_gudhi()
    assert gst.num_simplices() == st.num_simplices()
    for simplex, filt in st.get_filtration():
        assert gst.filtration(list(simplex)) == pytest.approx(
            filt, abs=1e-12
        )
    from flooder_tpu.topology import SimplexTree, bottleneck_distance

    back = SimplexTree.from_gudhi(gst)
    assert back.num_simplices() == st.num_simplices()
    st.compute_persistence()
    back.compute_persistence()
    gst.compute_persistence()
    for dim in (0, 1, 2):
        ours = st.persistence_intervals_in_dimension(dim)
        theirs = np.asarray(
            gst.persistence_intervals_in_dimension(dim)
        ).reshape(-1, 2)
        again = back.persistence_intervals_in_dimension(dim)
        assert bottleneck_distance(ours, theirs) < 1e-9
        assert bottleneck_distance(ours, again) < 1e-9


def test_from_gudhi_duck_typed():
    """from_gudhi needs only get_simplices(); exercise the conversion in
    this gudhi-free environment with a duck-typed stand-in, round-tripped
    from a real flood complex via get_filtration (same (simplex, value)
    iteration contract as gudhi's get_simplices)."""
    from flooder_tpu.topology import SimplexTree

    pts = generate_noisy_torus_points_3d(500, seed=5)
    st = flood_complex(
        np.asarray(pts), 40, points_per_edge=5, return_simplex_tree=True
    )

    class _FakeGudhiTree:
        def get_simplices(self):
            yield from st.get_filtration()

    back = SimplexTree.from_gudhi(_FakeGudhiTree())
    assert back.num_simplices() == st.num_simplices()
    for simplex, filt in st.get_filtration():
        assert back.filtration(simplex) == filt
    st.compute_persistence()
    back.compute_persistence()
    for dim in (0, 1):
        a = st.persistence_intervals_in_dimension(dim)
        b = back.persistence_intervals_in_dimension(dim)
        assert np.allclose(np.sort(a, axis=0), np.sort(b, axis=0))
