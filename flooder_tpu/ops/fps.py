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


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    points: jax.Array,
    n_samples: int,
    start_idx=0,
) -> jax.Array:
    """Select ``n_samples`` indices by exact greedy farthest-point sampling.

    Args:
        points: (N, d) float array.
        n_samples: number of samples (static).
        start_idx: index of the first selected point (traced or static).

    Returns:
        (n_samples,) int32 array of indices into ``points``.
    """
    # Accumulate distances in float32 even for low-precision inputs.
    pts = points.astype(jnp.float32) if points.dtype == jnp.bfloat16 else points
    start_idx = jnp.asarray(start_idx, dtype=jnp.int32)

    first = pts[start_idx]
    min_d2 = jnp.sum((pts - first) ** 2, axis=-1)

    idxs = jnp.zeros((n_samples,), dtype=jnp.int32).at[0].set(start_idx)

    def body(i, state):
        min_d2, idxs = state
        nxt = jnp.argmax(min_d2).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        new_d2 = jnp.sum((pts - pts[nxt]) ** 2, axis=-1)
        min_d2 = jnp.minimum(min_d2, new_d2)
        return min_d2, idxs

    if n_samples > 1:
        _, idxs = jax.lax.fori_loop(1, n_samples, body, (min_d2, idxs))
    return idxs
