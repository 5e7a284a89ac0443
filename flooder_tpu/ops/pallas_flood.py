"""Fused Pallas TPU kernel for flood min-distances.

TPU-native replacement for the reference's two Triton kernels
(triton_kernels.py:99-158 ``compute_mask`` and :12-45 ``compute_filtration``).
The reference sparsifies (simplex, witness) pairs on the host with
``mask.nonzero()`` and gathers them in a second kernel with atomics; both
patterns are GPU-idioms that stall on TPU (dynamic shapes, no atomics).
Here the two kernels fuse into ONE dense Pallas kernel driven by a
precomputed **active-pair work-list** (SURVEY §7 idiom 1):

- Witnesses are sorted by **Morton code** (bit-interleaved spatial cells),
  so a contiguous chunk of the witness array is a spatially tight box.
- For every (simplex-block, witness-chunk) pair, a vectorized XLA pass
  tests whether any bounding ball of the block intersects the chunk's
  bounding box; only intersecting pairs enter the work-list. This prunes in
  ALL ambient dimensions — strictly stronger than the reference's 1-D
  ``searchsorted`` window (core.py:201-208).
- The kernel walks the work-list (scalar-prefetched indices choose which
  blocks to DMA), computes masked squared distances with the
  coordinate-difference form in ball-local coordinates, and folds a running
  minimum into the (simplex, sample) output block. Pairs of the same
  simplex-block are consecutive, so output revisiting is sequential — the
  TPU-legal replacement for ``tl.atomic_min`` (triton_kernels.py:45).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block geometry: BS simplices × RT sample points per output tile, WC
# witnesses per chunk. Lanes carry the sample axis (RT) in the output and
# the witness axis (WC) in the distance tile.
BS = 8
RT = 512
MORTON_BITS_TOTAL = 24
# Work-list pairs per kernel launch: 3 int32 scalar-prefetch arrays of this
# length must fit the chip's 1MB SMEM alongside control state.
PAIR_SEGMENT = 32768


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _x32_mode():
    """Context manager disabling x64 during kernel tracing."""
    try:
        from jax._src.config import enable_x64 as _state

        return _state(False)
    except Exception:  # pragma: no cover - jax-version fallback
        import contextlib

        return contextlib.nullcontext()


# ---------------------------------------------------------------------------
# Morton ordering
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("bits",))
def morton_codes(points: jax.Array, bits: int) -> jax.Array:
    """Morton (Z-order) codes of points, ``bits`` bits per axis.

    Quantizes each coordinate to [0, 2^bits) over the cloud's bounding box
    and interleaves the bits. Total code width = bits * d <= 30.
    """
    n, d = points.shape
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    extent = jnp.maximum(hi - lo, 1e-30)
    q = ((points - lo) / extent * (2**bits - 1e-3)).astype(jnp.int32)
    q = jnp.clip(q, 0, 2**bits - 1)
    code = jnp.zeros((n,), dtype=jnp.int32)
    for b in range(bits):
        for ax in range(d):
            bit = (q[:, ax] >> b) & 1
            code = code | (bit << (b * d + ax))
    return code


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _flood_kernel(
    pair_s_ref,  # scalar prefetch: (P,) simplex-block id per pair
    pair_c_ref,  # scalar prefetch: (P,) witness-chunk id per pair
    pair_first_ref,  # scalar prefetch: (P,) 1 if first pair of its block
    samples_ref,  # (BS, dim, RT) ball-local sample coordinates
    wit_ref,  # (WC, dim) witness chunk
    cent_ref,  # (BS, dim) ball centers
    rad_ref,  # (BS, 1) ball radii
    acc_ref,  # (BS, RT) accumulator carried across launches (aliased)
    out_ref,  # (BS, RT) running min of squared distances
    *,
    bs: int,
    dim: int,
):
    p = pl.program_id(1)

    # First visit of this output block in this launch: seed from the
    # cross-launch accumulator (the aliased HBM buffer holds the running
    # min of all previous segments; inf on the very first one).
    @pl.when(pair_first_ref[p] == 1)
    def _init():
        out_ref[:] = acc_ref[:]

    y = wit_ref[:]  # (WC, dim)
    rt = samples_ref.shape[2]
    # chunk bounding box (witnesses are Morton-sorted, so it's tight)
    box_lo = jnp.min(y, axis=0, keepdims=True)  # (1, dim)
    box_hi = jnp.max(y, axis=0, keepdims=True)  # (1, dim)
    for s in range(bs):
        c_s = cent_ref[s : s + 1, :]  # (1, dim)
        r2 = rad_ref[s : s + 1, :] * rad_ref[s : s + 1, :]  # (1, 1)
        # per-simplex chunk skip: ball ∩ chunk-bbox test (the work-list
        # prunes at block granularity; this recovers simplex granularity)
        near = jnp.clip(c_s, box_lo, box_hi) - c_s  # (1, dim)
        near_d2 = jnp.sum(near * near, axis=1, keepdims=True)  # (1, 1)

        @pl.when(near_d2[0, 0] <= r2[0, 0])
        def _compute():
            yl = y - c_s  # (WC, dim) ball-local witnesses
            y2 = jnp.sum(yl * yl, axis=1, keepdims=True)  # (WC, 1)
            # Mask by moving rejected witnesses far away: (big − x)²
            # saturates in f32 and drops out of the min — no per-element
            # select.
            ymask = jnp.where(y2 <= r2, yl, jnp.float32(3e18))  # (WC, dim)
            xb = samples_ref[s]  # (dim, RT)
            d2 = jnp.zeros((ymask.shape[0], rt), dtype=jnp.float32)
            for i in range(dim):
                diff = ymask[:, i : i + 1] - xb[i : i + 1, :]
                d2 = d2 + diff * diff
            chunk_min = jnp.min(d2, axis=0, keepdims=True)  # (1, RT)
            out_ref[s : s + 1, :] = jnp.minimum(
                out_ref[s : s + 1, :], chunk_min
            )


@functools.partial(
    jax.jit,
    static_argnames=("bs", "rt", "wchunk", "dim", "interpret"),
    donate_argnums=(7,),
)
def _flood_pairs_call(
    pair_s,
    pair_c,
    pair_first,
    samples,  # (SB*BS, dim, R2) ball-local
    witnesses,  # (W, dim)
    centers,  # (SB*BS, dim)
    radii,  # (SB*BS, 1)
    acc,  # (SB*BS, R2) running min (donated/aliased in place)
    *,
    bs: int,
    rt: int,
    wchunk: int,
    dim: int,
    interpret: bool,
):
    r2 = samples.shape[2]
    npairs = pair_s.shape[0]

    grid = (r2 // rt, npairs)

    kernel = functools.partial(_flood_kernel, bs=bs, dim=dim)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (bs, dim, rt),
                    lambda r, p, ps, pc, pf: (ps[p], 0, r),
                ),
                pl.BlockSpec(
                    (wchunk, dim),
                    lambda r, p, ps, pc, pf: (pc[p], 0),
                ),
                pl.BlockSpec(
                    (bs, dim),
                    lambda r, p, ps, pc, pf: (ps[p], 0),
                ),
                pl.BlockSpec(
                    (bs, 1),
                    lambda r, p, ps, pc, pf: (ps[p], 0),
                ),
                pl.BlockSpec(
                    (bs, rt),
                    lambda r, p, ps, pc, pf: (ps[p], r),
                ),
            ],
            out_specs=pl.BlockSpec(
                (bs, rt),
                lambda r, p, ps, pc, pf: (ps[p], r),
            ),
        ),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        # alias the accumulator input onto the output: untouched blocks
        # keep their previous values, touched blocks are re-seeded from
        # the accumulator at their first pair of this launch
        input_output_aliases={7: 0},
        interpret=interpret,
    )(pair_s, pair_c, pair_first, samples, witnesses, centers, radii, acc)
    return out


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("wchunk", "bs"))
def _active_pairs_matrix(centers, radii, chunk_lo, chunk_hi, wchunk, bs):
    """(n_sblocks, n_chunks) bool: does any ball of the simplex block
    intersect the witness chunk's bounding box?"""
    s_total = centers.shape[0]
    n_sblocks = s_total // bs
    c = centers.reshape(n_sblocks, bs, -1)
    r = radii.reshape(n_sblocks, bs)
    # closest point of box to each center
    nearest = jnp.clip(
        c[:, :, None, :], chunk_lo[None, None, :, :], chunk_hi[None, None, :, :]
    )
    d2 = jnp.sum((c[:, :, None, :] - nearest) ** 2, axis=-1)
    hit = d2 <= (r[:, :, None] ** 2)
    return jnp.any(hit, axis=1)


class PallasFloodEngine:
    """Morton-ordered, work-list-driven fused TPU engine."""

    def __init__(self, points: jax.Array, wchunk: int, interpret=None):
        if points.dtype != jnp.float32:
            raise TypeError(
                "the Pallas flood engine supports float32 only; "
                "use the dense engine (use_pallas=False) for float64"
            )
        if interpret is None:
            from ..utils.device import platform_of

            interpret = platform_of(points) != "tpu"
        self.interpret = interpret
        # witness chunk length: bounded for VMEM ((WC, dim) tile + (WC, RT)
        # distance tile per unrolled simplex)
        self.wchunk = min(512, max(128, wchunk))
        n, dim = points.shape
        self.dim = dim
        bits = max(1, min(10, MORTON_BITS_TOTAL // dim))
        codes = morton_codes(points, bits)
        order = jnp.argsort(codes)
        pts_sorted = points[order]
        total = _round_up(max(n, self.wchunk), self.wchunk)
        if total != n:
            # Pad by repeating the last witness: keeps chunk bounding boxes
            # tight (an inf pad would blow up the last chunk's box). The
            # duplicated witnesses are real points — harmless under min.
            reps = jnp.repeat(pts_sorted[-1:], total - n, axis=0)
            pts_sorted = jnp.concatenate([pts_sorted, reps], axis=0)
        self.witnesses = pts_sorted
        self._bits = bits
        n_chunks = total // self.wchunk
        chunks = pts_sorted.reshape(n_chunks, self.wchunk, dim)
        self.chunk_lo = jnp.min(chunks, axis=1)
        self.chunk_hi = jnp.max(chunks, axis=1)

    def order(self, centers: jax.Array) -> jax.Array:
        return jnp.argsort(morton_codes(centers, self._bits))

    def min_distances(self, verts, weights, centers, radii, batch_size):
        del batch_size  # block geometry is fixed by the kernel
        num_simplices, k, dim = verts.shape
        r_count = weights.shape[0]
        # Bucket the simplex-block count to a power of two: the output shape
        # is part of the kernel compile key, and remote Mosaic compiles are
        # expensive — buckets make repeat clouds hit the compile cache.
        n_sblocks = 1 << max(0, (-(-num_simplices // BS) - 1)).bit_length()
        s_total = n_sblocks * BS
        rt = min(RT, _round_up(r_count, 128))
        r2_total = _round_up(r_count, rt)

        # Pad simplices with far-away zero-radius balls: they intersect no
        # witness chunk, so padding adds no work-list pairs (their output
        # rows are sliced off below).
        if s_total != num_simplices:
            pad_n = s_total - num_simplices
            verts = jnp.concatenate(
                [verts, jnp.full((pad_n, k, dim), 8e14, verts.dtype)]
            )
            centers = jnp.concatenate(
                [centers, jnp.full((pad_n, dim), 8e14, centers.dtype)]
            )
            radii = jnp.concatenate([radii, jnp.zeros((pad_n,), radii.dtype)])

        # Ball-local samples, laid out (S, dim, R) so lanes carry samples.
        weights_p = jnp.zeros((r2_total, k), weights.dtype).at[:r_count].set(
            weights
        )
        verts_local = verts - centers[:, None, :]
        samples = jnp.einsum(
            "rk,skd->sdr",
            weights_p,
            verts_local,
            precision=jax.lax.Precision.HIGHEST,
        )  # (S, dim, R2)

        # Active-pair work-list (host-side nonzero of a device bool matrix).
        active = np.asarray(
            _active_pairs_matrix(
                centers, radii, self.chunk_lo, self.chunk_hi,
                self.wchunk, BS,
            )
        )
        pair_s_np, pair_c_np = np.nonzero(active)  # row-major: sorted by s
        pair_s_np = pair_s_np.astype(np.int32)
        pair_c_np = pair_c_np.astype(np.int32)

        # Segment the work-list into fixed-size launches: scalar-prefetch
        # operands live in the chip's 1MB SMEM, and a fixed segment length
        # keeps the grid (a compile key) stable across clouds. The running
        # min is carried across launches through an aliased accumulator;
        # blocks untouched by every segment simply keep their inf init.
        seg_len = PAIR_SEGMENT
        if self.interpret:
            # interpreter: no compile cache to protect — right-size segments
            seg_len = max(256, 1 << max(0, len(pair_s_np) - 1).bit_length())
            seg_len = min(seg_len, PAIR_SEGMENT)
        nseg = max(1, -(-len(pair_s_np) // seg_len))
        total_pairs = nseg * seg_len
        if total_pairs != len(pair_s_np):
            pad = total_pairs - len(pair_s_np)
            if len(pair_s_np):
                # repeat the last pair: the min-fold is idempotent
                pair_s_np = np.concatenate(
                    [pair_s_np, np.repeat(pair_s_np[-1:], pad)]
                )
                pair_c_np = np.concatenate(
                    [pair_c_np, np.repeat(pair_c_np[-1:], pad)]
                )
            else:
                pair_s_np = np.zeros(pad, dtype=np.int32)
                pair_c_np = np.zeros(pad, dtype=np.int32)

        acc = jnp.full((s_total, r2_total), jnp.inf, dtype=jnp.float32)
        radii2 = radii[:, None]
        # Mosaic rejects int64 index arithmetic; trace the kernel in x32
        # mode regardless of the process-wide x64 setting (the whole
        # engine path is float32/int32).
        with _x32_mode():
            for g in range(nseg):
                sl = slice(g * seg_len, (g + 1) * seg_len)
                seg_s = pair_s_np[sl]
                seg_c = pair_c_np[sl]
                seg_first = np.concatenate(
                    [[1], (seg_s[1:] != seg_s[:-1]).astype(np.int32)]
                ).astype(np.int32)
                acc = _flood_pairs_call(
                    jnp.asarray(seg_s),
                    jnp.asarray(seg_c),
                    jnp.asarray(seg_first),
                    samples,
                    self.witnesses,
                    centers,
                    radii2,
                    acc,
                    bs=BS,
                    rt=rt,
                    wchunk=self.wchunk,
                    dim=dim,
                    interpret=self.interpret,
                )
        return jnp.sqrt(acc[:num_simplices, :r_count])
