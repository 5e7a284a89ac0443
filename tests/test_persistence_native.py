"""Cross-check the native C++ persistence reduction against the pure-Python
fallback (same twist/clearing algorithm, independent implementations)."""

import numpy as np
import pytest

from flooder_tpu.native.build import load_native
from flooder_tpu.topology import AlphaComplex
from flooder_tpu.topology.persistence import _reduce_py, reduce_filtration


def _boundary_of_tree(st):
    """Extract (dims, offsets, indices) in filtration order from a tree."""
    st._flush()
    order, dims_sorted, rows_sorted = st._filtration_order()
    n = st.num_simplices()
    offsets_per_dim = np.zeros(len(st._verts) + 1, dtype=np.int64)
    for d, v in enumerate(st._verts):
        offsets_per_dim[d + 1] = offsets_per_dim[d] + v.shape[0]
    rank_of_global = np.empty(n, dtype=np.int64)
    global_sorted = offsets_per_dim[dims_sorted.astype(np.int64)] + rows_sorted
    rank_of_global[global_sorted] = np.arange(n)

    from flooder_tpu.topology._keys import find_rows

    col_counts = (dims_sorted.astype(np.int64) + 1) * (dims_sorted > 0)
    bnd_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(col_counts, out=bnd_offsets[1:])
    bnd_indices = np.empty(bnd_offsets[-1], dtype=np.int64)
    for d in range(1, len(st._verts)):
        v = st._verts[d]
        if not len(v):
            continue
        ranks_here = rank_of_global[offsets_per_dim[d] + np.arange(v.shape[0])]
        for j in range(d + 1):
            facet = np.ascontiguousarray(np.delete(v, j, axis=1))
            pos = find_rows(st._verts[d - 1], facet)
            bnd_indices[bnd_offsets[ranks_here] + j] = rank_of_global[
                offsets_per_dim[d - 1] + pos
            ]
    return dims_sorted.astype(np.int8), bnd_offsets, bnd_indices


@pytest.mark.skipif(load_native() is None, reason="native lib unavailable")
def test_native_matches_python_reduction():
    rng = np.random.default_rng(7)
    pts = rng.random((120, 3))
    st = AlphaComplex(pts).create_simplex_tree()
    dims, offsets, indices = _boundary_of_tree(st)

    pairs_n, ess_n = reduce_filtration(dims, offsets, indices)
    pairs_p, ess_p = _reduce_py(dims, offsets, indices)

    assert sorted(map(tuple, pairs_n.tolist())) == sorted(
        map(tuple, pairs_p.tolist())
    )
    assert sorted(ess_n.tolist()) == sorted(ess_p.tolist())
    # sanity: one essential vertex (connected complex), Euler characteristic
    assert (dims == 0).sum() == 120
