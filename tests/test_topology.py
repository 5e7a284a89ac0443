"""Tests for the native topology layer (SimplexTree, persistence, alpha,
bottleneck) — the subsystem the reference delegates to gudhi."""

import numpy as np
import pytest

from flooder_tpu.topology import (
    AlphaComplex,
    DelaunayComplex,
    SimplexTree,
    bottleneck_distance,
)


def _triangle_tree():
    st = SimplexTree()
    st.insert([0], 0.0)
    st.insert([1], 0.0)
    st.insert([2], 0.0)
    st.insert([0, 1], 1.0)
    st.insert([1, 2], 2.0)
    st.insert([0, 2], 3.0)
    st.insert([0, 1, 2], 4.0)
    return st


def test_simplex_tree_basics():
    st = _triangle_tree()
    assert st.num_simplices() == 7
    assert st.num_vertices() == 3
    assert st.dimension() == 2
    assert st.find([0, 1])
    assert not st.find([0, 3])
    assert st.filtration([0, 2]) == 3.0
    faces = dict()
    for face, f in st.get_boundaries([0, 1, 2]):
        faces[tuple(face)] = f
    assert faces == {(0, 1): 1.0, (1, 2): 2.0, (0, 2): 3.0}


def test_insert_closure_and_no_overwrite():
    st = SimplexTree()
    st.insert([0, 1, 2], 5.0)
    assert st.num_simplices() == 7
    assert st.filtration([0, 1]) == 5.0
    # re-insert is a no-op (gudhi semantics)
    st.insert([0, 1], 1.0)
    assert st.filtration([0, 1]) == 5.0
    # assign overrides
    st.assign_filtration([0, 1], 2.0)
    assert st.filtration([0, 1]) == 2.0


def test_make_filtration_non_decreasing():
    st = _triangle_tree()
    st.assign_filtration([0, 1, 2], 0.5)  # below its faces
    assert st.make_filtration_non_decreasing()
    assert st.filtration([0, 1, 2]) == 3.0
    assert not st.make_filtration_non_decreasing()


def test_persistence_triangle():
    st = _triangle_tree()
    st.compute_persistence()
    d0 = st.persistence_intervals_in_dimension(0)
    d1 = st.persistence_intervals_in_dimension(1)
    # 3 components born at 0; two merge at 1 and 2; one lives forever
    assert len(d0) == 3
    deaths = sorted(d0[:, 1])
    assert deaths[0] == 1.0 and deaths[1] == 2.0 and np.isinf(deaths[2])
    # the hole closes: born when the cycle completes (3), dies at fill (4)
    assert len(d1) == 1
    assert d1[0, 0] == 3.0 and d1[0, 1] == 4.0


def test_persistence_circle_complex():
    # cycle 0-1-2-...-9-0, all edges at time 1 => one essential H1 class
    st = SimplexTree()
    for i in range(10):
        st.insert([i], 0.0)
    for i in range(10):
        st.insert([i, (i + 1) % 10], 1.0)
    st.compute_persistence()
    d0 = st.persistence_intervals_in_dimension(0)
    d1 = st.persistence_intervals_in_dimension(1)
    assert (np.isinf(d0[:, 1])).sum() == 1
    assert len(d0) == 10
    assert len(d1) == 1 and np.isinf(d1[0, 1])
    assert st.betti_numbers()[:2] == [1, 1]


def test_delaunay_complex_square():
    pts = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    st = DelaunayComplex(pts).create_simplex_tree()
    # 4 vertices, 5 edges, 2 triangles
    assert st.num_vertices() == 4
    assert st.num_simplices() == 11
    assert st.dimension() == 2


def test_alpha_circle_h1():
    rng = np.random.default_rng(0)
    theta = rng.uniform(0, 2 * np.pi, 200)
    pts = np.stack([np.cos(theta), np.sin(theta)], 1)
    pts += rng.normal(0, 0.01, pts.shape)
    st = AlphaComplex(pts).create_simplex_tree(output_squared_values=False)
    st.compute_persistence()
    d1 = st.persistence_intervals_in_dimension(1)
    pers = d1[:, 1] - d1[:, 0]
    # exactly one dominant 1-cycle with persistence near the radius
    assert (pers > 0.5).sum() == 1
    d0 = st.persistence_intervals_in_dimension(0)
    assert np.isinf(d0[:, 1]).sum() == 1


def test_alpha_monotone():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (150, 3))
    st = AlphaComplex(pts).create_simplex_tree()
    for simplex, filt in st.get_simplices():
        for face, face_filt in st.get_boundaries(simplex):
            assert face_filt <= filt + 1e-12


def test_alpha_matches_distance_on_pair():
    # two points: the edge appears at (half distance)^2
    pts = np.array([[0.0, 0.0], [2.0, 0.0]])
    st = AlphaComplex(pts).create_simplex_tree()
    assert st.filtration([0, 1]) == pytest.approx(1.0)
    st2 = AlphaComplex(pts).create_simplex_tree(output_squared_values=False)
    assert st2.filtration([0, 1]) == pytest.approx(1.0)
    pts3 = np.array([[0.0, 0.0], [4.0, 0.0]])
    st3 = AlphaComplex(pts3).create_simplex_tree()
    assert st3.filtration([0, 1]) == pytest.approx(4.0)


def test_bottleneck_simple():
    d1 = np.array([[0.0, 10.0], [2.0, 5.0]])
    d2 = np.array([[0.5, 10.0], [2.0, 5.5]])
    assert bottleneck_distance(d1, d2) == pytest.approx(0.5)
    # diagonal absorption: a tiny bar matches the diagonal
    d3 = np.array([[0.0, 10.0], [4.0, 4.4]])
    d4 = np.array([[0.0, 10.0]])
    assert bottleneck_distance(d3, d4) == pytest.approx(0.2)


def test_bottleneck_inf_bars():
    d1 = np.array([[0.0, np.inf], [1.0, 2.0]])
    d2 = np.array([[0.25, np.inf], [1.0, 2.0]])
    assert bottleneck_distance(d1, d2) == pytest.approx(0.25)
    d3 = np.array([[0.0, np.inf], [0.0, np.inf]])
    assert bottleneck_distance(d1, d3) == np.inf


def test_bottleneck_identity():
    rng = np.random.default_rng(3)
    b = rng.uniform(0, 1, 50)
    d = b + rng.uniform(0, 1, 50)
    diag = np.stack([b, d], 1)
    assert bottleneck_distance(diag, diag) == 0.0


def test_empty_diagrams():
    assert bottleneck_distance(np.empty((0, 2)), np.empty((0, 2))) == 0.0
    d = np.array([[0.0, 1.0]])
    assert bottleneck_distance(d, np.empty((0, 2))) == pytest.approx(0.5)
