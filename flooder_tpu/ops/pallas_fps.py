"""Pallas TPU kernel for exact greedy farthest-point sampling.

The XLA ``fori_loop`` FPS (ops/fps.py) pays ~0.8 ms of loop/launch latency
per landmark on TPU — 2000 landmarks cost ~1.6 s against ~50 ms of actual
memory traffic. This kernel runs the WHOLE greedy loop on-chip:

- the cloud is **Hilbert-sorted** so every (d, CHUNK) tile of the point
  stream is a spatially tight box,
- the running min-squared-distance array lives in **HBM** (aliased
  in/out), so cloud size is bounded by HBM, not VMEM — rows stream
  through VMEM only for chunks that actually change,
- each greedy sweep folds the new landmark into the running min-distances
  **only for chunks the landmark can actually lower**: a chunk whose
  bounding-box distance to the landmark is at least its current max
  min-distance cannot change (min(m, d) = m when d ≥ m for every member),
  so the sweep skips its DMA and arithmetic entirely. Per-chunk running
  max / argmax live in VMEM and stay valid across skipped sweeps. After
  the first few sweeps a landmark touches only the handful of chunks
  around it, turning the O(L·N) restream into ~O(N + L · ball(N/L)).
- the global argmax (next landmark) is reduced from the per-chunk maxima
  in registers; the landmark's coordinates are fetched with one tiny DMA.

Replaces the host round-trip + Rust bucket-FPS of the reference
(core.py:291-343) and the per-step dispatch chain of the XLA loop. The
selected landmark SET is the exact greedy one (identical distances;
tie-breaking may differ from the unsorted variant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FPS_CHUNK = 8192
# The min-distance array is HBM-resident (one f32 per point); the binding
# constraint is the per-chunk VMEM state (cmax/cbest/adm scratches and the
# box inputs are (nchunks, ·) arrays, lane-padded to 128 by Mosaic →
# ~2.5KB per chunk). 100M points ≈ 12.2k chunks ≈ 30MB of VMEM state,
# comfortably inside the raised scoped limit below; larger clouds fall
# back to the XLA loop.
FPS_MAX_POINTS = 100_000_000


def fits_pallas_fps(n_points: int, dim: int = 3) -> bool:
    # _fps_prepare lays points out as (dim_pad=8, N); clouds with more
    # dimensions fall back to the XLA loop rather than crash the reshape.
    return n_points <= FPS_MAX_POINTS and dim <= 8


def _x32_mode():
    try:
        from jax._src.config import enable_x64 as _state

        return _state(False)
    except Exception:  # pragma: no cover
        import contextlib

        return contextlib.nullcontext()


def _fps_kernel(
    start_ref,  # SMEM (1,) int32: start index (in sorted order)
    pts_ref,  # HBM (d, N) points, N = nchunks * CHUNK
    box_lo_ref,  # VMEM (d, nchunks) chunk bounding-box lower corners
    box_hi_ref,  # VMEM (d, nchunks) chunk bounding-box upper corners
    _mind2_in_ref,  # HBM (1, N) running min d² (aliased to out)
    out_ref,  # VMEM (1, L) int32 selected indices
    mind2_ref,  # HBM (1, N) running min d² (the alias target)
    cmax_ref,  # VMEM scratch (1, nchunks) per-chunk max of mind2
    cbest_ref,  # VMEM scratch (1, nchunks) int32 per-chunk argmax index
    adm_ref,  # VMEM scratch (1, nchunks) int32 admission bits
    adm_smem_ref,  # SMEM scratch (1, nchunks) int32 admission bits
    row_ref,  # VMEM scratch (1, CHUNK) staging for one mind2 slice
    lm_ref,  # VMEM scratch (dim_pad, 1) current landmark coordinates
    lmwin_ref,  # VMEM scratch (dim_pad, 128) aligned landmark window
    buf_ref,  # VMEM scratch (dim_pad, CHUNK) point-chunk buffer
    sem,  # DMA semaphore for point fetches
    row_sem,  # DMA semaphore for mind2 slice traffic
    lm_sem,  # DMA semaphore for landmark fetch
    adm_sem,  # DMA semaphore for the admission-bit VMEM→SMEM copy
    *,
    n_samples: int,
    chunk: int,
    dim: int,
):
    # Every dynamically-indexed array in this kernel is laid out
    # lane-major ((1, n) / (d, n)), never (n, 1)/(n, chunk): Mosaic
    # rejects slices of extent 1 along a tiled sublane dimension
    # ("Slice shape along dimension 0 must be aligned to tiling (8)"),
    # a backend rule the off-hardware lowering gate cannot see — it
    # failed on the real chip on 2026-08-18. Scalar writes at a dynamic
    # chunk index become masked lane-selects; the per-chunk admission
    # bit is DMA'd to SMEM once per sweep so the chunk loop branches on
    # a plain scalar read.
    nchunks = cmax_ref.shape[1]

    def fetch_landmark(idx):
        """Fetch the landmark column via a lane-aligned 128-wide window
        (HBM lane slices must be 128-aligned), then extract the column
        with a masked lane-reduce.

        All scalar arithmetic stays explicit int32: ``idx // 128`` via
        jnp would promote the literal to a weak int64, and Mosaic's
        convert_element_type lowering recurses forever on scalar
        i64->i32 (caught off-hardware by tests/test_tpu_lowering.py).
        """
        c128 = jnp.int32(128)
        base = pl.multiple_of(jax.lax.div(idx, c128) * c128, 128)
        copy = pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(base, 128)], lmwin_ref, lm_sem
        )
        copy.start()
        copy.wait()
        lane = jax.lax.rem(idx, c128)
        iota = jax.lax.broadcasted_iota(jnp.int32, lmwin_ref.shape, 1)
        lm_ref[:] = jnp.sum(
            jnp.where(iota == lane, lmwin_ref[:], jnp.float32(0.0)),
            axis=1,
            keepdims=True,
        )

    # ---- select the start landmark and initialize state ----
    start = start_ref[0]
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    out_ref[:] = jnp.where(out_lanes == 0, start, jnp.int32(0))
    fetch_landmark(start)
    cmax_ref[:] = jnp.full(cmax_ref.shape, jnp.inf, dtype=jnp.float32)
    cbest_ref[:] = jnp.zeros(cbest_ref.shape, dtype=jnp.int32)

    def sweep(l, _):
        """One greedy step: fold the current landmark into the running
        min-distances of every chunk it can lower, refresh those chunks'
        running max/argmax, then pick the global argmax."""
        lm = lm_ref[:]  # (dim_pad, 1)
        gap = jnp.maximum(
            jnp.maximum(box_lo_ref[:] - lm, lm - box_hi_ref[:]),
            jnp.float32(0.0),
        )  # (dim_pad, nchunks)
        lb2 = jnp.sum(gap * gap, axis=0, keepdims=True)  # (1, nchunks)
        # strict <: when the bound equals the chunk max, no member can
        # drop below its current min-distance
        adm_ref[:] = (lb2 < cmax_ref[:]).astype(jnp.int32)
        ac = pltpu.make_async_copy(adm_ref, adm_smem_ref, adm_sem)
        ac.start()
        ac.wait()
        clanes = jax.lax.broadcasted_iota(jnp.int32, cmax_ref.shape, 1)

        def chunk_body(c, _c):
            @pl.when(adm_smem_ref[0, c] == 1)
            def _update(c=c):
                col = pl.multiple_of(c * chunk, chunk)
                cp = pltpu.make_async_copy(
                    pts_ref.at[:, pl.ds(col, chunk)], buf_ref, sem
                )
                cp.start()
                rp = pltpu.make_async_copy(
                    mind2_ref.at[:, pl.ds(col, chunk)], row_ref, row_sem
                )
                rp.start()
                cp.wait()
                rp.wait()
                tile = buf_ref[:]  # (d, CHUNK)
                diff = tile - lm_ref[:]
                d2 = jnp.sum(diff * diff, axis=0, keepdims=True)
                new = jnp.minimum(row_ref[:], d2)  # (1, CHUNK)
                row_ref[:] = new
                wb = pltpu.make_async_copy(
                    row_ref, mind2_ref.at[:, pl.ds(col, chunk)], row_sem
                )
                wb.start()
                cmax = jnp.max(new)
                iota = jax.lax.broadcasted_iota(jnp.int32, new.shape, 1)
                clane = jnp.min(
                    jnp.where(new == cmax, iota, jnp.int32(2**30))
                )
                sel = clanes == c
                cmax_ref[:] = jnp.where(sel, cmax, cmax_ref[:])
                cbest_ref[:] = jnp.where(
                    sel, c * chunk + clane, cbest_ref[:]
                )
                wb.wait()

            return _c

        # int32 carries/bounds: weak-int64 scalars do not lower to Mosaic
        jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(nchunks), chunk_body, jnp.int32(0)
        )

        # global argmax over the per-chunk maxima
        gm = jnp.max(cmax_ref[:])
        cstar = jnp.min(
            jnp.where(cmax_ref[:] == gm, clanes, jnp.int32(2**30))
        )
        # max, not sum: jnp.sum widens integer accumulators to 64-bit
        # under x64 and Mosaic rejects 64-bit types (indices are >= 0,
        # so masking the other lanes to 0 keeps the max exact)
        best_idx = jnp.max(
            jnp.where(clanes == cstar, cbest_ref[:], jnp.int32(0))
        )
        out_ref[:] = jnp.where(out_lanes == l, best_idx, out_ref[:])
        fetch_landmark(best_idx)
        return jnp.int32(0)

    jax.lax.fori_loop(
        jnp.int32(1), jnp.int32(n_samples), sweep, jnp.int32(0),
        unroll=False,
    )


@functools.partial(
    jax.jit, static_argnames=("n_samples", "chunk", "interpret")
)
def _fps_call(
    pts_t, box_lo, box_hi, start_idx, *, n_samples: int, chunk: int,
    interpret: bool = False,
):
    dim, n_total = pts_t.shape
    nchunks = n_total // chunk
    mind2 = jnp.full((1, n_total), jnp.inf, dtype=jnp.float32)
    kernel = functools.partial(
        _fps_kernel, n_samples=n_samples, chunk=chunk, dim=dim
    )
    out, _ = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, nchunks), jnp.float32),
                pltpu.VMEM((1, nchunks), jnp.int32),
                pltpu.VMEM((1, nchunks), jnp.int32),
                pltpu.SMEM((1, nchunks), jnp.int32),
                pltpu.VMEM((1, chunk), jnp.float32),
                pltpu.VMEM((dim, 1), jnp.float32),
                pltpu.VMEM((dim, 128), jnp.float32),
                pltpu.VMEM((dim, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, n_samples), jnp.int32),
            jax.ShapeDtypeStruct((1, n_total), jnp.float32),
        ],
        # the running min-distance array is read-modify-written in place
        input_output_aliases={4: 1},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # per-chunk VMEM state scales with the cloud (see
            # FPS_MAX_POINTS); the default 16MB scoped limit caps out
            # around 50M points
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(start_idx.reshape(1), pts_t, box_lo, box_hi, mind2)
    return out[0]


@functools.partial(jax.jit, static_argnames=("chunk", "dim_pad"))
def _fps_prepare(points, start, *, chunk: int, dim_pad: int):
    """Hilbert-sort the cloud and lay it out for the kernel.

    Returns (pts_t (dim_pad, N_pad) sorted+transposed, box_lo/box_hi
    (dim_pad, nchunks) chunk bounding boxes, sorted_start scalar, order
    (N,) permutation so ``original_index = order[sorted_index]``).
    """
    from .pallas_flood import hilbert_codes, morton_codes

    n, dim = points.shape
    bits = max(1, min(10, 24 // dim))
    codes = (
        hilbert_codes(points, bits) if dim > 1 else morton_codes(points, bits)
    )
    order = jnp.argsort(codes)
    pts_sorted = points[order].astype(jnp.float32)
    sorted_start = jnp.argmax(
        (order == start).astype(jnp.int32)
    ).astype(jnp.int32)

    pts_t = jnp.transpose(pts_sorted)  # (dim, N)
    if dim < dim_pad:
        pts_t = jnp.concatenate(
            [pts_t, jnp.zeros((dim_pad - dim, n), jnp.float32)]
        )
    n_pad = ((max(n, chunk) + chunk - 1) // chunk) * chunk
    if n_pad != n:
        # pad with copies of the start point: padded columns always have
        # min-distance 0 and can never be selected
        start_col = jax.lax.dynamic_slice(
            pts_t, (jnp.int32(0), sorted_start), (dim_pad, 1)
        )
        pad = jnp.tile(start_col, (1, n_pad - n))
        pts_t = jnp.concatenate([pts_t, pad], axis=1)
    nchunks = n_pad // chunk
    boxes = pts_t.reshape(dim_pad, nchunks, chunk)
    box_lo = jnp.min(boxes, axis=2)  # (dim_pad, nchunks)
    box_hi = jnp.max(boxes, axis=2)
    return pts_t, box_lo, box_hi, sorted_start, order


def pallas_farthest_point_sampling(
    points: jax.Array, n_samples: int, start_idx=0, interpret: bool = None
) -> jax.Array:
    """Exact greedy FPS with the whole loop fused on-chip.

    Args:
        points: (N, d) float32 array on a TPU device (or any backend with
            ``interpret=True``).
        n_samples: number of samples (static).
        start_idx: index of the first selected point.
        interpret: run the kernel in the Pallas interpreter (defaults to
            True off-TPU so the kernel is CI-testable).

    Returns:
        (n_samples,) int32 indices into ``points``.
    """
    if interpret is None:
        from ..utils.device import platform_of

        interpret = platform_of(points) != "tpu"
    start = jnp.asarray(start_idx, dtype=jnp.int32)
    with _x32_mode():
        pts_t, box_lo, box_hi, sorted_start, order = _fps_prepare(
            points, start, chunk=FPS_CHUNK, dim_pad=8
        )
        idx_sorted = _fps_call(
            pts_t,
            box_lo,
            box_hi,
            sorted_start,
            n_samples=n_samples,
            chunk=FPS_CHUNK,
            interpret=bool(interpret),
        )
    return order[idx_sorted]
