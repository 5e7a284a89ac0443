"""Edge-case and stress tests: higher ambient dimensions, reduced
max_dimension, tiny landmark sets (SURVEY §7 phase 5 / behavioral edge
cases from reference core.py:91-153)."""

import numpy as np
import pytest

from flooder_tpu import flood_complex, generate_swiss_cheese_points
from flooder_tpu.topology import SimplexTree


def test_max_dimension_below_ambient():
    """max_dimension=2 in 3D: grid mode processes only triangles; the tree
    still holds tetrahedra whose filtration is repaired from faces."""
    pts, _, _ = generate_swiss_cheese_points(2000, seed=3)
    st = flood_complex(
        pts, 100, max_dimension=2, points_per_edge=8,
        return_simplex_tree=True, start_idx=0,
    )
    dims = {}
    for s, f in st.get_simplices():
        dims.setdefault(len(s) - 1, 0)
        dims[len(s) - 1] += 1
        assert np.isfinite(f) or len(s) - 1 > 2
    assert 0 in dims and 1 in dims and 2 in dims
    # faces <= cofaces still holds
    st.compute_persistence()
    assert len(st.persistence_intervals_in_dimension(0)) > 0


def test_4d_cloud():
    rng = np.random.default_rng(0)
    pts = rng.random((3000, 4)).astype(np.float32)
    fc = flood_complex(pts, 60, points_per_edge=5, start_idx=0)
    max_card = max(len(s) for s in fc)
    assert max_card == 5  # 4-simplices present
    st = SimplexTree()
    for s, v in fc.items():
        st.insert(s, v)
    st.compute_persistence()
    d0 = st.persistence_intervals_in_dimension(0)
    assert np.isinf(d0[:, 1]).sum() == 1  # connected


def test_rand_mode_4d():
    rng = np.random.default_rng(1)
    pts = rng.random((2000, 4)).astype(np.float32)
    np.random.seed(0)
    fc = flood_complex(pts, 40, num_rand=64, points_per_edge=None, start_idx=0)
    assert all(np.isfinite(v) for v in fc.values())


def test_tiny_landmark_sets():
    rng = np.random.default_rng(2)
    pts = rng.random((500, 3)).astype(np.float32)
    # 5 landmarks in 3D: a near-degenerate Delaunay complex
    fc = flood_complex(pts, 5, points_per_edge=6, start_idx=0)
    assert len(fc) >= 5
    verts = [s for s in fc if len(s) == 1]
    assert len(verts) == 5


def test_landmarks_exceed_points_in_ball_masks():
    """landmarks == witnesses on a tiny cloud: every filtration finite."""
    rng = np.random.default_rng(4)
    pts = rng.random((64, 2)).astype(np.float32)
    fc = flood_complex(pts, pts, points_per_edge=6)
    assert all(np.isfinite(v) for v in fc.values())


def test_empty_ball_is_inf_on_every_engine():
    """A simplex whose bounding ball contains NO witness must get +inf on
    the Pallas engine too, even when the ball's bbox overlaps a witness
    sub-chunk bbox (the kernel computes the tile with every witness
    masked to the far constant — the epilogue must report inf, matching
    the dense engines, not ~3e18)."""
    rng = np.random.default_rng(7)
    # two witness clusters, both inside ONE sub-chunk (n < SUB), so the
    # sub-chunk bbox spans x in [~0.2, ~0.8] and CONTAINS the ball centre
    # below — the sub-chunk is admitted, then every witness is masked
    centers = np.array([[0.2, 0.5], [0.8, 0.5]], np.float32)
    pts = (
        centers[rng.integers(0, 2, 400)]
        + rng.normal(0, 0.02, (400, 2))
    ).astype(np.float32)
    # landmark triangle in the empty middle: inflated circumball radius
    # ~0.085 reaches no witness (nearest is ~0.25 away)
    lms = np.array(
        [[0.45, 0.45], [0.55, 0.45], [0.5, 0.55]], np.float32
    )
    fc_dense = flood_complex(
        pts, lms, points_per_edge=6, use_pallas=False,
        landmarks_in_cloud=False,
    )
    fc_pallas = flood_complex(
        pts, lms, points_per_edge=6, use_pallas=True,
        landmarks_in_cloud=False,
    )
    assert set(fc_dense) == set(fc_pallas)
    assert any(np.isinf(v) for v in fc_dense.values())
    for s, v in fc_dense.items():
        got = fc_pallas[s]
        if np.isinf(v):
            assert np.isinf(got), f"{s}: pallas {got}, dense inf"
        else:
            assert got == pytest.approx(v, abs=1e-5)
    # the mesh engine shares the mask constant and must normalize too
    from flooder_tpu.parallel import make_mesh

    fc_mesh = flood_complex(
        pts, lms, points_per_edge=6, mesh=make_mesh(simplex_parallel=2),
        landmarks_in_cloud=False,
    )
    for s, v in fc_dense.items():
        got = fc_mesh[s]
        if np.isinf(v):
            assert np.isinf(got), f"{s}: mesh {got}, dense inf"
        else:
            assert got == pytest.approx(v, abs=1e-5)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_nontight_jittered_landmark_parity(seed):
    """Pallas vs dense parity with landmarks jittered OFF the cloud
    (non-tight mode disables the lossless tile prune and exercises the
    witness-mask paths the tight-mode tests never reach)."""
    from flooder_tpu import generate_noisy_torus_points_3d, generate_landmarks

    rng = np.random.default_rng(seed)
    pts = generate_noisy_torus_points_3d(1200, seed=seed)
    lms = np.asarray(generate_landmarks(pts, 60, start_idx=0))
    lms = (lms + rng.normal(0, 0.05, lms.shape)).astype(np.float32)
    fc_dense = flood_complex(
        pts, lms, points_per_edge=6, use_pallas=False,
        landmarks_in_cloud=False,
    )
    fc_pallas = flood_complex(
        pts, lms, points_per_edge=6, use_pallas=True,
        landmarks_in_cloud=False,
    )
    assert set(fc_dense) == set(fc_pallas)
    for s, v in fc_dense.items():
        got = fc_pallas[s]
        if np.isinf(v):
            assert np.isinf(got)
        else:
            assert got == pytest.approx(v, abs=1e-5), s


def test_shared_face_min_combine_order_independent():
    """Documented deviation from the reference (ref core.py:251-268): a
    face shared by several top-simplices gets the **min** over the
    per-coface ball-restricted estimates, not the iteration-order last
    writer. Min-combination makes grid-mode values independent of simplex
    labeling/order — pin that by relabeling the landmarks and checking the
    relabeled complex carries identical filtrations."""
    rng = np.random.default_rng(7)
    pts = rng.random((1500, 3)).astype(np.float32)
    from flooder_tpu import generate_landmarks

    lms = np.asarray(generate_landmarks(pts, 40, start_idx=0))
    perm = rng.permutation(len(lms))

    fc_a = flood_complex(pts, lms, points_per_edge=6)
    fc_b = flood_complex(pts, lms[perm], points_per_edge=6)

    # index i into lms[perm] is original landmark perm[i]
    fc_b_mapped = {
        tuple(int(i) for i in sorted(perm[list(s)])): v
        for s, v in fc_b.items()
    }
    assert set(fc_a) == set(fc_b_mapped)
    shared = 0
    for s, v in fc_a.items():
        assert fc_b_mapped[s] == pytest.approx(v, abs=2e-6, nan_ok=True)
        if len(s) == 3:
            shared += 1
    assert shared > 50  # plenty of shared triangles exercised


def test_pallas_4d_interpret():
    rng = np.random.default_rng(5)
    pts = rng.random((2000, 4)).astype(np.float32)
    fc_d = flood_complex(pts, 40, points_per_edge=5, use_pallas=False, start_idx=0)
    fc_p = flood_complex(pts, 40, points_per_edge=5, use_pallas=True, start_idx=0)
    for s, v in fc_d.items():
        assert fc_p[s] == pytest.approx(v, abs=1e-5, nan_ok=True)


def test_5d_cloud_grid_mode():
    """SURVEY phase-5 hardening: 5-D ambient dim stresses the stars-and-
    bars grid (C(n+dim-1, dim) growth) and face enumeration (2^6-1 faces
    per top simplex; ref core.py:346-402 caps nothing by dimension)."""
    rng = np.random.default_rng(7)
    pts = rng.random((1200, 5)).astype(np.float32)
    fc = flood_complex(pts, 24, points_per_edge=4, start_idx=0)
    max_card = max(len(s) for s in fc)
    assert max_card == 6  # 5-simplices present
    # valid filtered complex: every face value <= coface value
    for s, v in fc.items():
        if len(s) == 1:
            continue
        for drop in range(len(s)):
            face = s[:drop] + s[drop + 1:]
            assert fc[face] <= v + 1e-6
    st = SimplexTree()
    for s, v in fc.items():
        st.insert(s, v)
    st.compute_persistence()
    d0 = st.persistence_intervals_in_dimension(0)
    assert np.isinf(d0[:, 1]).sum() == 1  # connected


def test_6d_cloud_random_mode():
    """6-D random-sampling mode: every dimension bucket 0..6 is looped
    (random mode visits every dim, ref core.py:149-150) and values are
    finite with landmarks inside the cloud."""
    rng = np.random.default_rng(8)
    pts = rng.random((800, 6)).astype(np.float32)
    np.random.seed(3)
    fc = flood_complex(
        pts, 16, num_rand=32, points_per_edge=None, start_idx=0
    )
    cards = {len(s) for s in fc}
    assert cards == set(range(1, 8))  # 0..6-simplices all present
    assert all(np.isfinite(v) for v in fc.values())


def test_degenerate_geometry_end_to_end():
    """Degenerate inputs the reference delegates to gudhi/CGAL's joggle:
    near-coplanar 3-D clouds, duplicated points, and Pallas/dense parity
    on the degenerate cloud (Qhull QJ handles the flat Delaunay)."""
    rng = np.random.default_rng(1)
    pts = rng.random((3000, 3)).astype(np.float32)
    pts[:, 2] *= 1e-6  # near-coplanar
    fc = flood_complex(pts, 40, points_per_edge=5, start_idx=0)
    vals = np.array(list(fc.values()))
    assert len(fc) > 100 and np.isfinite(vals).all()

    fc_p = flood_complex(
        pts, 40, points_per_edge=5, start_idx=0, use_pallas=True
    )
    for s, v in fc.items():
        assert fc_p[s] == pytest.approx(v, abs=1e-5)

    dup = rng.random((1000, 3)).astype(np.float32)
    dup = np.concatenate([dup, dup[:500]])  # 50% duplicates
    fc2 = flood_complex(dup, 30, points_per_edge=5, start_idx=0)
    assert len(fc2) > 100


def test_delaunay_degenerate_landmark_sets():
    """Coplanar / collinear / duplicated landmark sets must triangulate
    (the reference inherits this robustness from CGAL; ours from Qhull)."""
    from flooder_tpu.topology import DelaunayComplex

    rng = np.random.default_rng(0)
    coplanar = np.zeros((50, 3))
    coplanar[:, :2] = rng.random((50, 2))
    st = DelaunayComplex(coplanar).create_simplex_tree()
    assert sum(len(v) for v in st._verts) > 100

    collinear = np.zeros((20, 3))
    collinear[:, 0] = np.linspace(0, 1, 20)
    DelaunayComplex(collinear).create_simplex_tree()

    dupes = rng.random((30, 3))
    dupes[10] = dupes[0]
    dupes[20] = dupes[0]
    DelaunayComplex(dupes).create_simplex_tree()
