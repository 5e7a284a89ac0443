"""Dense flood-distance engine (XLA, backend-portable).

This is the TPU-first redesign of the reference's distance backends
(reference core.py:190-248: Triton mask+filtration kernels, a naive CUDA
loop, and a scipy-KDTree CPU path). Key idiom changes (SURVEY §7):

- No ``nonzero``/sparse gather: the ball mask is applied **densely** as a
  select inside a statically-shaped chunked min-reduction, so the whole
  pipeline stays inside one ``jit``.
- Squared distances accumulate coordinate differences in ball-local
  coordinates: floating-point subtraction is relative-accurate, so the
  error is O(eps·d²) at any cloud/ball scale ratio — matching the
  reference kernels' accumulation (triton_kernels.py:37-41) and its 3e-6
  float32/float64 consistency bound.
- The reference's per-batch host loop (core.py:193) becomes one
  ``lax.scan`` over simplex batches with per-batch witness windows realized
  as clamped dynamic slices: a single device dispatch per dimension pass.

Engines expose a two-phase interface consumed by ``core.flood_complex``:
``prepare(points)`` once per call (witness ordering, padding), then
``order(centers)`` + ``min_distances(...)`` per dimension pass. The Pallas
TPU engine (ops/pallas_flood.py) implements the same interface with
Morton-ordered witnesses and an active-pair work-list.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# Coordinate value used to pad the witness array: far enough that padded
# rows always fail every ball test, small enough not to overflow float32
# when squared.
WITNESS_PAD = 1.0e15


@jax.jit
def simplex_bounding_balls(simplex_vertices: jax.Array):
    """Bounding-ball centers and radii of a batch of simplices.

    Mirrors the reference's construction (core.py:155-172): the center is
    the midpoint of the farthest vertex pair (diameter pair); the radius is
    the max center-to-vertex distance inflated by 1.42 for dim > 1 (1.01
    otherwise) plus a 1e-3 slack.

    Args:
        simplex_vertices: (S, k, d) vertex coordinates (k = dim + 1).

    Returns:
        (centers (S, d), radii (S,)).
    """
    v = simplex_vertices
    s, k, _ = v.shape
    diffs = v[:, :, None, :] - v[:, None, :, :]
    d2 = jnp.sum(diffs * diffs, axis=-1)  # (S, k, k)
    flat_idx = jnp.argmax(d2.reshape(s, k * k), axis=1)
    i0, i1 = flat_idx // k, flat_idx % k
    rows = jnp.arange(s)
    centers = (v[rows, i0] + v[rows, i1]) / 2.0
    radial = jnp.linalg.norm(v - centers[:, None, :], axis=-1)
    factor = 1.42 if (k - 1) > 1 else 1.01
    radii = jnp.amax(radial, axis=1) * factor + 1e-3
    return centers, radii


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_rows(arr: jax.Array, total: int) -> jax.Array:
    if arr.shape[0] == total:
        return arr
    reps = jnp.repeat(arr[-1:], total - arr.shape[0], axis=0)
    return jnp.concatenate([arr, reps], axis=0)


def _masked_chunk_min(x_local, r2, bcent, w_chunk, acc):
    """Fold one witness chunk into the running (B, R) min-d² accumulator.

    Distances use the coordinate-difference form ``Σ_i (x_i − y_i)²`` on
    ball-local coordinates — relative-accurate independent of the
    cloud/ball scale ratio. The MXU dot-product form (|x|²−2x·y+|y|²)
    amplifies error by (ball_radius/distance)² and is reserved for pruning
    passes, not final values.
    """
    y_local = w_chunk[None, :, :] - bcent[:, None, :]  # (B, C, d)
    y2 = jnp.sum(y_local * y_local, axis=-1)  # (B, C): center-to-witness d²
    mask = y2 <= r2[:, None]
    dim = w_chunk.shape[-1]
    d2 = jnp.zeros(
        (x_local.shape[0], x_local.shape[1], w_chunk.shape[0]),
        dtype=x_local.dtype,
    )
    for i in range(dim):
        diff = x_local[:, :, None, i] - y_local[:, None, :, i]
        d2 = d2 + diff * diff
    d2 = jnp.where(mask[:, None, :], d2, jnp.inf)
    return jnp.minimum(acc, jnp.min(d2, axis=-1))


@partial(jax.jit, static_argnames=("wchunk",))
def flood_min_distances(
    verts: jax.Array,
    weights: jax.Array,
    centers: jax.Array,
    radii: jax.Array,
    witnesses: jax.Array,
    imin: jax.Array,
    imax: jax.Array,
    wchunk: int = 2048,
) -> jax.Array:
    """Min distance from every simplex sample point to the witness cloud.

    For each simplex s and sample point r the result is
    ``min over witnesses w inside ball(s) of ||sample(s, r) − w||``
    (+inf where the ball is empty), the quantity the reference computes with
    its mask/filtration Triton kernels (triton_kernels.py:12-158).

    Args:
        verts: (nb, B, k, d) batched simplex vertex coordinates.
        weights: (R, k) barycentric sample weights (grid or random).
        centers: (nb, B, d) bounding-ball centers.
        radii: (nb, B) bounding-ball radii.
        witnesses: (W, d) witness points sorted along the widest axis,
            padded to a multiple of ``wchunk`` with ``WITNESS_PAD``.
        imin / imax: (nb,) per-batch window bounds into ``witnesses``
            (reference core.py:201-208, computed vectorized on device here).
        wchunk: witness chunk length (static).

    Returns:
        (nb, B, R) distances.
    """
    dtype = witnesses.dtype
    dim = witnesses.shape[1]
    r_count = weights.shape[0]

    def batch_fn(_, xs):
        bverts, bcent, brad, lo, hi = xs
        # Sample points in ball-local coordinates: barycentric weights sum
        # to 1, so weights @ (verts − center) == samples − center exactly,
        # but computed at O(ball radius) magnitude instead of O(cloud
        # diameter).
        bverts_local = bverts - bcent[:, None, :]
        x_local = jnp.einsum(
            "rk,bkd->brd",
            weights,
            bverts_local,
            precision=jax.lax.Precision.HIGHEST,
        )
        r2 = brad * brad

        nchunks = jnp.maximum(0, (hi - lo + wchunk - 1) // wchunk)
        init = jnp.full((bverts.shape[0], r_count), jnp.inf, dtype=dtype)

        def chunk_body(ci, acc):
            s = (lo + ci * wchunk).astype(jnp.int32)
            w = jax.lax.dynamic_slice(
                witnesses, (s, jnp.int32(0)), (wchunk, dim)
            )
            return _masked_chunk_min(x_local, r2, bcent, w, acc)

        acc = jax.lax.fori_loop(0, nchunks, chunk_body, init)
        return None, jnp.sqrt(acc)

    _, out = jax.lax.scan(batch_fn, None, (verts, centers, radii, imin, imax))
    return out


@partial(jax.jit, static_argnames=("wchunk",))
def batch_windows(
    centers_axis: jax.Array,
    radii: jax.Array,
    witness_axis: jax.Array,
    wchunk: int = 2048,
):
    """Per-batch witness windows along the sorted axis.

    Vectorized version of the reference's per-batch searchsorted windowing
    (core.py:201-208): for each simplex batch, the window is the index range
    of witnesses whose sort-axis coordinate falls within
    [min(center − r), max(center + r)] over the batch.
    """
    vmin = jnp.min(centers_axis - radii, axis=1)
    vmax = jnp.max(centers_axis + radii, axis=1)
    imin = jnp.searchsorted(witness_axis, vmin, side="left")
    imax = jnp.searchsorted(witness_axis, vmax, side="right")
    imin = (imin // wchunk) * wchunk
    return imin.astype(jnp.int32), imax.astype(jnp.int32)


class DenseFloodEngine:
    """Backend-portable engine: axis-sorted witnesses + scanned batches.

    On CPU backends the reduction runs in the native C++ kernel
    (native/src/flood_cpu.cpp) when available — the counterpart of the
    reference's C++ KDTree CPU path (reference core.py:197-199); the
    scanned XLA formulation stays as the accelerator path and the
    fallback.
    """

    def __init__(self, points: jax.Array, wchunk: int):
        self.wchunk = wchunk
        self.dtype = points.dtype
        n_pts, dim = points.shape
        # Widest axis (reference core.py:140-144); one tiny host sync.
        self.mrd = int(
            jnp.argmax(jnp.max(points, axis=0) - jnp.min(points, axis=0))
        )
        pts_sorted = points[jnp.argsort(points[:, self.mrd])]
        self._native = None
        from ..utils.device import platform_of

        if platform_of(points) == "cpu" and dim <= 16:
            try:
                from ..native import load_native

                lib = load_native()
                if lib is not None and hasattr(lib, "flood_min_dist_f32"):
                    self._native = lib
                    import numpy as np

                    self._wit_np = np.ascontiguousarray(
                        np.asarray(pts_sorted[:n_pts])
                    )
                    self._waxis_np = np.ascontiguousarray(
                        self._wit_np[:, self.mrd]
                    )
            except Exception:  # pragma: no cover - graceful degrade
                self._native = None
        total = _round_up(max(n_pts, wchunk), wchunk)
        if total != n_pts:
            pad = jnp.full((total - n_pts, dim), WITNESS_PAD, dtype=points.dtype)
            pts_sorted = jnp.concatenate([pts_sorted, pad], axis=0)
        self.witnesses = pts_sorted
        self.witness_axis = pts_sorted[:, self.mrd]

    def _native_min_distances(self, verts, weights, centers, radii):
        """Native C++ reduction (CPU): per-simplex sorted-axis window +
        ball filter + SIMD min-fold over samples.

        Chunked over simplices so the (B, dim, R) samples intermediate plus
        the (B, R) output stay bounded (~256 MB) on host, matching the cap
        the XLA path enforces on device — grid mode at thousands of samples
        per simplex over tens of thousands of simplices would otherwise
        allocate multiple GB in one numpy call.
        """
        import ctypes

        import numpy as np

        dt = np.float64 if self.dtype == jnp.float64 else np.float32
        cptr = ctypes.c_double if dt == np.float64 else ctypes.c_float
        fn = (
            self._native.flood_min_dist_f64
            if dt == np.float64
            else self._native.flood_min_dist_f32
        )
        verts_np = np.asarray(verts, dtype=dt)
        centers_np = np.ascontiguousarray(np.asarray(centers, dtype=dt))
        radii_np = np.ascontiguousarray(np.asarray(radii, dtype=dt))
        weights_np = np.asarray(weights, dtype=dt)
        s_count = verts_np.shape[0]
        dim = verts_np.shape[-1]
        r_count = weights_np.shape[0]
        out = np.empty((s_count, r_count), dtype=dt)
        p = lambda a: a.ctypes.data_as(ctypes.POINTER(cptr))
        max_b = max(1, (256 << 20) // max(1, r_count * (dim + 1) * dt().itemsize))
        for start in range(0, s_count, max_b):
            end = min(start + max_b, s_count)
            verts_local = (
                verts_np[start:end] - centers_np[start:end, None, :]
            )
            # (B, dim, R): transposed so the C++ inner loop vectorizes over R
            samples = np.ascontiguousarray(
                np.einsum("rk,skd->sdr", weights_np, verts_local)
            )
            cen = np.ascontiguousarray(centers_np[start:end])
            rad = np.ascontiguousarray(radii_np[start:end])
            chunk_out = np.empty((end - start, r_count), dtype=dt)
            rc = fn(
                end - start, r_count, dim, len(self._wit_np),
                p(samples), p(cen), p(rad),
                p(self._wit_np), p(self._waxis_np),
                int(self.mrd), p(chunk_out),
            )
            if rc != 0:  # pragma: no cover - defensive
                return None
            out[start:end] = chunk_out
        return jnp.asarray(out)

    def order(self, centers: jax.Array) -> jax.Array:
        """Processing order for simplices (spatial coherence of windows)."""
        return jnp.argsort(centers[:, self.mrd])

    def min_distances(
        self,
        verts: jax.Array,
        weights: jax.Array,
        centers: jax.Array,
        radii: jax.Array,
        batch_size: int,
        tight: bool = False,
    ) -> jax.Array:
        """(S, R) min distances; S rows ordered as the inputs.

        ``tight`` (landmarks ⊆ witnesses) is a kernel-level pruning hint
        used by the Pallas engine; the dense reduction ignores it.
        """
        del tight
        num_simplices = verts.shape[0]
        if self._native is not None:
            out = self._native_min_distances(verts, weights, centers, radii)
            if out is not None:
                return out
        bsz = max(1, min(int(batch_size), num_simplices))
        # Cap the (B, R, C) distance intermediate at ~256 MB so a large
        # user batch size cannot OOM accelerator memory.
        r_count = weights.shape[0]
        elem = jnp.dtype(self.dtype).itemsize
        max_b = max(1, (256 << 20) // max(1, r_count * self.wchunk * elem))
        bsz = min(bsz, max_b)
        nb = -(-num_simplices // bsz)
        # Round the batch count up to a power of two to bound retracing.
        nb_padded = 1 if nb == 1 else 1 << (nb - 1).bit_length()
        total = nb_padded * bsz

        dim = verts.shape[-1]
        verts_b = _pad_rows(verts, total).reshape(nb_padded, bsz, -1, dim)
        centers_b = _pad_rows(centers, total).reshape(nb_padded, bsz, dim)
        radii_b = _pad_rows(radii, total).reshape(nb_padded, bsz)

        imin, imax = batch_windows(
            centers_b[..., self.mrd], radii_b, self.witness_axis, self.wchunk
        )
        if nb_padded != nb:
            live = jnp.arange(nb_padded) < nb
            imax = jnp.where(live, imax, imin)

        out = flood_min_distances(
            verts_b, weights, centers_b, radii_b,
            self.witnesses, imin, imax, wchunk=self.wchunk,
        )
        return out.reshape(total, -1)[:num_simplices]
