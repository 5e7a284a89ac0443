"""Pallas TPU kernel for exact greedy farthest-point sampling.

The XLA ``fori_loop`` FPS (ops/fps.py) pays ~0.8 ms of loop/launch latency
per landmark on TPU — 2000 landmarks cost ~1.6 s against ~50 ms of actual
memory traffic. This kernel runs the WHOLE greedy loop on-chip:

- the running min-squared-distance array stays resident in VMEM,
- points stream through double-buffered (d, CHUNK) tiles from HBM,
- per chunk, one fused pass updates the min-distances and tracks the
  global argmax (next landmark) in scalar registers,
- the selected landmark's coordinates are fetched with a single tiny DMA.

Replaces the host round-trip + Rust bucket-FPS of the reference
(core.py:291-343) and the per-step dispatch chain of the XLA loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FPS_CHUNK = 8192
# The running min-distance array lives in VMEM (one f32 per point; the
# chip has ~128MB of VMEM). Clouds beyond this budget fall back to the
# XLA loop.
FPS_MAX_POINTS = 24_000_000


def fits_pallas_fps(n_points: int) -> bool:
    return n_points <= FPS_MAX_POINTS


def _x32_mode():
    try:
        from jax._src.config import enable_x64 as _state

        return _state(False)
    except Exception:  # pragma: no cover
        import contextlib

        return contextlib.nullcontext()


def _fps_kernel(
    start_ref,  # SMEM (1,) int32: start index
    pts_ref,  # HBM (d, N) points, N = nchunks * CHUNK
    out_ref,  # VMEM (L, 1) int32 selected indices
    mind2_ref,  # VMEM scratch (nchunks, CHUNK) running min d²
    lm_ref,  # VMEM scratch (dim_pad, 1) current landmark coordinates
    lmwin_ref,  # VMEM scratch (dim_pad, 128) aligned landmark window
    buf_ref,  # VMEM scratch (2, dim_pad, CHUNK) double buffer
    sem,  # DMA semaphores (2,)
    lm_sem,  # DMA semaphore for landmark fetch
    *,
    n_samples: int,
    chunk: int,
    dim: int,
):
    nchunks = mind2_ref.shape[0]

    def fetch(slot, c):
        return pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(c * chunk, chunk)],
            buf_ref.at[slot],
            sem.at[slot],
        )

    def fetch_landmark(idx):
        """Fetch the landmark column via a lane-aligned 128-wide window
        (HBM lane slices must be 128-aligned), then extract the column
        with a masked lane-reduce."""
        base = pl.multiple_of((idx // 128) * 128, 128)
        copy = pltpu.make_async_copy(
            pts_ref.at[:, pl.ds(base, 128)], lmwin_ref, lm_sem
        )
        copy.start()
        copy.wait()
        lane = idx % 128
        iota = jax.lax.broadcasted_iota(jnp.int32, lmwin_ref.shape, 1)
        lm_ref[:] = jnp.sum(
            jnp.where(iota == lane, lmwin_ref[:], 0.0),
            axis=1,
            keepdims=True,
        )

    # ---- select the start landmark and initialize min-distances ----
    start = start_ref[0]
    out_ref[pl.ds(0, 1), :] = start.reshape(1, 1)
    fetch_landmark(start)
    mind2_ref[:] = jnp.full(mind2_ref.shape, jnp.inf, dtype=jnp.float32)

    def sweep(l, _):
        """One greedy step: fold the current landmark into the running
        min-distances while tracking the global argmax."""

        fetch(0, 0).start()

        def chunk_body(c, carry):
            best_val, best_idx = carry
            slot = c % 2

            @pl.when(c + 1 < nchunks)
            def _():
                fetch((c + 1) % 2, c + 1).start()

            fetch(slot, c).wait()
            tile = buf_ref[slot]  # (d, CHUNK)
            lm = lm_ref[:]  # (d, 1)
            diff = tile - lm
            d2 = jnp.sum(diff * diff, axis=0, keepdims=True)  # (1, CHUNK)
            prev = mind2_ref[pl.ds(c, 1), :]  # (1, CHUNK)
            new = jnp.minimum(prev, d2)
            mind2_ref[pl.ds(c, 1), :] = new
            cmax = jnp.max(new)
            # lane index of the max (iota-select; avoids 1D argmax on TPU)
            iota = jax.lax.broadcasted_iota(jnp.int32, new.shape, 1)
            clane = jnp.min(
                jnp.where(new == cmax, iota, jnp.int32(2**30))
            )
            better = cmax > best_val
            best_val = jnp.where(better, cmax, best_val)
            best_idx = jnp.where(better, c * chunk + clane, best_idx)
            return best_val, best_idx

        best_val, best_idx = jax.lax.fori_loop(
            0, nchunks, chunk_body, (jnp.float32(-1.0), jnp.int32(0))
        )

        out_ref[pl.ds(l, 1), :] = best_idx.reshape(1, 1)
        fetch_landmark(best_idx)
        return 0

    jax.lax.fori_loop(1, n_samples, sweep, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("n_samples", "chunk"))
def _fps_call(pts_t, start_idx, *, n_samples: int, chunk: int):
    dim, n_total = pts_t.shape
    nchunks = n_total // chunk
    kernel = functools.partial(
        _fps_kernel, n_samples=n_samples, chunk=chunk, dim=dim
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((nchunks, chunk), jnp.float32),
                pltpu.VMEM((dim, 1), jnp.float32),
                pltpu.VMEM((dim, 128), jnp.float32),
                pltpu.VMEM((2, dim, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_samples, 1), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the min-distance scratch is VMEM-resident (one f32/point);
            # the default 16MB scoped limit is far below physical VMEM
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(start_idx.reshape(1), pts_t)
    return out[:, 0]


def pallas_farthest_point_sampling(
    points: jax.Array, n_samples: int, start_idx=0
) -> jax.Array:
    """Exact greedy FPS with the whole loop fused on-chip.

    Args:
        points: (N, d) float32 array on a TPU device.
        n_samples: number of samples (static).
        start_idx: index of the first selected point.

    Returns:
        (n_samples,) int32 indices into ``points``.
    """
    n, dim = points.shape
    start = jnp.asarray(start_idx, dtype=jnp.int32)
    n_pad = ((max(n, FPS_CHUNK) + FPS_CHUNK - 1) // FPS_CHUNK) * FPS_CHUNK
    pts_t = points.astype(jnp.float32).T  # (d, N)
    # pad the coordinate axis to the HBM tile height (zero rows contribute
    # (0-0)² = 0 to every distance)
    dim_pad = 8
    if dim < dim_pad:
        pts_t = jnp.concatenate(
            [pts_t, jnp.zeros((dim_pad - dim, pts_t.shape[1]), jnp.float32)]
        )
    if n_pad != n:
        # pad with copies of the start point: padded columns always have
        # min-distance 0 and can never be selected
        start_col = jax.lax.dynamic_slice(
            pts_t, (jnp.int32(0), start), (dim_pad, 1)
        )
        pad = jnp.tile(start_col, (1, n_pad - n))
        pts_t = jnp.concatenate([pts_t, pad], axis=1)
    with _x32_mode():
        return _fps_call(
            pts_t, start, n_samples=n_samples, chunk=FPS_CHUNK
        )
