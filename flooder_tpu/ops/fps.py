"""Farthest-point sampling (FPS) as a jittable JAX loop.

The reference delegates landmark selection to the Rust ``fpsample`` bucket
FPS (reference core.py:291-343, QuickFPS / TCAD 2023), which forces a
device→host round-trip of the full cloud. The TPU-native redesign keeps the
cloud on device and runs exact greedy FPS as a ``lax.fori_loop`` over a
running min-squared-distance array: each step selects ``argmax`` of the
running distances, then folds the new landmark in with one fused
distance+minimum pass over all N points. O(L·N·d) flops, fully vectorized
on the VPU, no host transfer.

Note: exact greedy FPS and bucketed approximate FPS select *different*
landmark sets for the same seed; the reference test-suite treats landmark
choice as an implementation detail (it tests FPS only for shape/dtype
properties, tests/test_landmarks.py:11-24) and pins explicit landmarks when
checking filtration parity.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def farthest_point_sampling(
    points: jax.Array,
    n_samples: int,
    start_idx=0,
) -> jax.Array:
    """Select ``n_samples`` indices by exact greedy farthest-point sampling.

    Internally works on the transposed (d, N) layout: with d in the
    sublanes and points in the lanes, every per-step op is a full-width
    vector op. The transpose runs as its own dispatch — fusing it into the
    sampling loop makes XLA's layout assignment materialize a lane-padded
    copy of the cloud (an (N, 2) array retiled to 128 lanes costs 64× its
    size in HBM, a 20 GB allocation at 40M points).

    Args:
        points: (N, d) float array.
        n_samples: number of samples (static).
        start_idx: index of the first selected point (traced or static).

    Returns:
        (n_samples,) int32 array of indices into ``points``.
    """
    # Accumulate distances in float32 even for low-precision inputs.
    pts = points.astype(jnp.float32) if points.dtype == jnp.bfloat16 else points
    # Split coordinates into separate 1-D arrays (eager, outside the loop
    # jit): every loop op then runs on packed (N,) vectors and XLA's layout
    # assignment never sees a 2-D array whose short dim it could make
    # minor-most (which pads it to 128 lanes — 20 GB for (40M, 2)).
    cols = tuple(pts[:, i] for i in range(pts.shape[1]))
    return _fps_columns(cols, n_samples, start_idx)


@partial(jax.jit, static_argnames=("n_samples",))
def _fps_columns(cols, n_samples: int, start_idx) -> jax.Array:
    start_idx = jnp.asarray(start_idx, dtype=jnp.int32)

    def dist2_to(idx):
        d2 = None
        for c in cols:
            diff = c - c[idx]
            d2 = diff * diff if d2 is None else d2 + diff * diff
        return d2

    min_d2 = dist2_to(start_idx)  # (N,)
    idxs = jnp.zeros((n_samples,), dtype=jnp.int32).at[0].set(start_idx)

    def body(i, state):
        min_d2, idxs = state
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        min_d2 = jnp.minimum(min_d2, dist2_to(nxt))
        return min_d2, idxs

    if n_samples > 1:
        _, idxs = jax.lax.fori_loop(1, n_samples, body, (min_d2, idxs))
    return idxs
