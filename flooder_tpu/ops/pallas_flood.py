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
- The kernel walks the work-list as a **1-D grid** (one step per pair;
  scalar-prefetched indices choose the DMA blocks): all sample tiles of a
  simplex block are processed inside the kernel, so the per-step grid
  overhead amortizes over the whole (8 simplices × R samples × 2048
  witnesses) unit of work. Within a step, witnesses are processed in
  512-point sub-chunks with a per-(simplex, sub-chunk) ball/bbox skip.
- Pairs of the same simplex-block are consecutive, so output revisiting is
  sequential — the TPU-legal replacement for ``tl.atomic_min``
  (triton_kernels.py:45). The running min is carried across launches
  through an aliased accumulator (fixed-size pair segments keep the
  scalar-prefetch operands inside the 1MB SMEM budget and make the grid a
  stable compile key).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.stagetimer import fence, note, stage

# Block geometry: BS simplices per block, RT sample points per tile (lanes),
# WCHUNK witnesses per DMA chunk processed in SUB-point sub-chunks.

# Fixed block geometry (the analogue of the reference's one tuned
# Triton geometry, ref core.py:26-29), frozen after the 2026-08-18
# hardware sweep (tpu_runs/sweep_r04.jsonl, 20 combos on a v5e chip;
# decision rules in tools/sweep_decide.py): the shipped geometry won
# every comparison — RT=256 cost +0.36 s, SUB=256 +0.21 s, the MXU
# dot-product formulation +2.1 s (bf16-pass-dominated and breaches the
# oracle tolerance at f32-HIGHEST anyway), the two-phase bound refresh
# +0.24 s, and kd witness ordering beat Hilbert by only +0.04 s —
# under its 0.1 s adoption threshold. Every losing code path is
# deleted; the hot engine has exactly one configuration.
BS = 8
RT = 512
WCHUNK = 2048
SUB = 512
MORTON_BITS_TOTAL = 24
# Work-list pairs per kernel launch: 3 int32 scalar-prefetch arrays of this
# length must fit the chip's 1MB SMEM alongside control state.
PAIR_SEGMENT = 8192


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


def _hilbert_from_quantized(q_cols, bits: int, where):
    """Hilbert index from quantized integer coordinates (Skilling's
    transpose algorithm, vectorized; ``where`` = np.where or jnp.where so
    the same code serves host and device callers).

    The witness order determines only which points share a chunk — any
    permutation is exact — but Hilbert-contiguous runs have no Z-order
    jumps, so chunk/sub-chunk bounding boxes are ~2x tighter by volume
    (measured on a uniform 1M cloud), which admits fewer work-list pairs
    and more in-kernel skips than Morton order.
    """
    X = [c for c in q_cols]
    d = len(X)
    Q = 1 << (bits - 1)
    while Q > 1:
        P = Q - 1
        for i in range(d):
            cond = (X[i] & Q) != 0
            t = (X[0] ^ X[i]) & P
            X0_new = where(cond, X[0] ^ P, X[0] ^ t)
            if i != 0:
                X[i] = where(cond, X[i], X[i] ^ t)
            X[0] = X0_new
        Q >>= 1
    for i in range(1, d):
        X[i] = X[i] ^ X[i - 1]
    t = X[0] * 0
    Q = 1 << (bits - 1)
    while Q > 1:
        t = where((X[d - 1] & Q) != 0, t ^ (Q - 1), t)
        Q >>= 1
    X = [x ^ t for x in X]
    code = X[0] * 0
    for b in range(bits):
        for i in range(d):
            code = code | (((X[i] >> b) & 1) << (b * d + (d - 1 - i)))
    return code


# Clouds whose padded witness total is at or below this use the HOST
# numpy kd ordering instead of the device program: the TPU sort codegen
# costs ~tens of seconds to minutes of AOT compile per power-of-two size
# bucket (see kd_order_device's note), which dwarfs everything a small
# cloud does (example_01's 10k row spent 36 s mostly here — the pre-fix
# run in tpu_runs/session_20260819_124546_r5examples.log's predecessor).
# At 262k the host path costs ~0.2 s per call with ZERO compile; the
# device path wins warm (~0.05 s) only after its one-time compile. Both
# produce the bit-identical permutation (tested).
KD_HOST_MAX = 262144


def use_host_kd(total: int, leaf: int) -> bool:
    """Route a witness ordering to the host numpy implementation.

    Host when the cloud is small (compile cost dwarfs the work — see
    KD_HOST_MAX) or when the leaf count is not a power of two: the
    rolled device program's segment arithmetic requires leaf-aligned
    power-of-two segment boundaries, while the host twin implements the
    original unrolled recursion and is correct for any leaf count (the
    mesh engine produces non-power-of-two leaf counts when the witness
    mesh axis is not a power of two)."""
    nl = total // leaf
    return total <= KD_HOST_MAX or (nl & (nl - 1)) != 0


def kd_order_np(points: np.ndarray, leaf: int) -> np.ndarray:
    """Host numpy kd ordering — same algorithm, same permutation as
    ``kd_order_device`` (stable per-segment argsort on each segment's
    widest axis; float32 comparisons are exact in both runtimes)."""
    pts = np.asarray(points)
    n, dim = pts.shape
    levels = max(0, (n // leaf - 1).bit_length())
    order = np.arange(n, dtype=np.int32)
    for lvl in range(levels):
        nseg = 1 << lvl
        m = n // nseg
        seg = pts.reshape(nseg, m, dim)
        ext = seg.max(axis=1) - seg.min(axis=1)
        ax = np.argmax(ext, axis=1)
        keys = np.take_along_axis(
            seg, ax[:, None, None].astype(np.int32), axis=2
        )[:, :, 0]
        idx = np.argsort(keys, axis=1, kind="stable")
        pts = np.take_along_axis(seg, idx[:, :, None], axis=1).reshape(
            n, dim
        )
        order = np.take_along_axis(
            order.reshape(nseg, m), idx, axis=1
        ).reshape(n)
    return order


@functools.partial(jax.jit, static_argnames=("leaf",))
def kd_order_device(points: jax.Array, leaf: int) -> jax.Array:
    """Balanced k-d ordering on device: median splits on each segment's
    widest axis via segmented sorts, until segments reach ``leaf`` points.

    ``points`` must have a power-of-two multiple of ``leaf`` rows (pad by
    repeating real points — duplicates are idempotent under the min-fold
    and keep leaf boxes tight, unlike far-sentinel padding whose mixed
    leaves would get huge boxes). Returns the permutation; consecutive
    ``leaf``-runs of the result partition space with disjoint boxes
    (~1.6x tighter than Hilbert runs by volume).

    The shipped witness ordering since the round-5 decision sweep: it
    beat Hilbert ordering in both hardware sessions that measured the
    pair head-to-head (vs_baseline 0.9642/0.9986 vs 0.9913 at 5f087e2,
    tpu_runs/sweep_r04.jsonl; 0.975 vs 1.016 with 5 reps each at
    17fb1cc, tpu_runs/sweep_r05.jsonl).

    Implementation note: the level loop is a ``fori_loop`` with a
    shape-invariant body, NOT a Python loop. An unrolled trace compiles
    one full-array sort per level into a single program — 17 levels at
    the 40M configuration produced a 50 MB compiled binary and minutes
    of compile time per new cloud size (the dominant cost of the r5
    scale-tier cold runs, tpu_runs/session_20260819_081004_r5scale.log).
    The rolled body makes compile time independent of the level count
    while producing the IDENTICAL permutation: segment extents reduce
    over static ``leaf``-run boxes (segment boundaries are always leaf
    boundaries), and the per-segment stable argsort becomes one stable
    two-key sort (segment id, chosen coordinate).

    Two formulation decisions, both hardware-measured (2026-08-19, v5e,
    16.8M x 3):

    - Payloads ride THROUGH the sort (variadic operands) instead of
      sorting ``(seg, key, iota)`` and gathering afterwards: 4.11 s/call
      vs 17.2 s — large-N random gathers cost far more than extra sort
      operands. A 64-bit composite single-key variant measured the same
      17.1 s for the same reason.
    - The coordinates are carried as ``dim`` separate 1-D arrays: a
      loop-carried (n, d) matrix is forced into an (8,128)-tiled layout
      whose minor-dim padding is a 128/d× blowup (32 GiB at 40M 2-D — a
      compile-time OOM).

    Residual cold cost: the one variadic sort dominates AOT compile at
    ~2 min per power-of-two cloud-size bucket (the sort codegen, not
    this function's structure: a minimal 2-operand sort alone compiles
    in 41 s on this backend). The persistent compilation cache makes it
    once-per-machine per bucket.
    """
    n, dim = points.shape
    levels = max(0, (n // leaf - 1).bit_length())
    order0 = jnp.arange(n, dtype=jnp.int32)
    if levels == 0:
        return order0
    nl = n // leaf  # leaf count (power of two by the padding contract)

    def body(lvl, carry):
        # The point set is carried as ``dim`` separate 1-D coordinate
        # arrays, NOT an (n, dim) matrix: a loop-carried (n, small-d)
        # buffer gets a (8,128)-tiled device layout whose minor-dim
        # padding is a 128/d× memory blowup — 32 GiB for the 40M 2-D
        # configuration, a hard OOM at compile time.
        order = carry[0]
        cols = carry[1:]
        nseg = jnp.left_shift(jnp.int32(1), lvl)
        lps = jnp.int32(nl) // nseg  # leaves per segment
        m = jnp.int32(n) // nseg  # points per segment
        # Segment min/max via the static leaf decomposition: a segment is
        # a contiguous run of leaves, so its box is the fold of leaf boxes.
        leaf_min = jnp.stack(
            [jnp.min(c.reshape(nl, leaf), axis=1) for c in cols], axis=1
        )  # (nl, dim)
        leaf_max = jnp.stack(
            [jnp.max(c.reshape(nl, leaf), axis=1) for c in cols], axis=1
        )
        seg_of_leaf = jnp.arange(nl, dtype=jnp.int32) // lps
        seg_min = jnp.full((nl, dim), jnp.inf, cols[0].dtype).at[
            seg_of_leaf
        ].min(leaf_min)
        seg_max = jnp.full((nl, dim), -jnp.inf, cols[0].dtype).at[
            seg_of_leaf
        ].max(leaf_max)
        ax = jnp.argmax(seg_max - seg_min, axis=1).astype(jnp.int32)
        seg_of_pt = jnp.arange(n, dtype=jnp.int32) // m
        axis_pp = ax[seg_of_pt]  # (n,) split axis per point
        key = cols[0]
        for j in range(1, dim):
            key = jnp.where(axis_pp == j, cols[j], key)
        sorted_ops = jax.lax.sort(
            (seg_of_pt, key, order) + cols,
            num_keys=2,
            is_stable=True,
        )
        return (sorted_ops[2],) + sorted_ops[3:]

    out = jax.lax.fori_loop(
        0,
        levels,
        body,
        (order0,) + tuple(points[:, j] for j in range(dim)),
    )
    return out[0]


@functools.partial(jax.jit, static_argnames=("bits",))
def hilbert_codes(points: jax.Array, bits: int) -> jax.Array:
    """Hilbert curve codes of points, ``bits`` bits per axis (device)."""
    lo = jnp.min(points, axis=0)
    extent = jnp.maximum(jnp.max(points, axis=0) - lo, 1e-30)
    q = ((points - lo) / extent * (2**bits - 1e-3)).astype(jnp.int32)
    q = jnp.clip(q, 0, 2**bits - 1)
    cols = [q[:, i] for i in range(points.shape[1])]
    return _hilbert_from_quantized(cols, bits, jnp.where)


def hilbert_codes_np(points: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert curve codes (host numpy; for small arrays like simplex
    centers where a device round-trip costs more than the computation)."""
    lo = points.min(axis=0)
    extent = np.maximum(points.max(axis=0) - lo, 1e-30)
    q = ((points - lo) / extent * (2**bits - 1e-3)).astype(np.int64)
    q = np.clip(q, 0, 2**bits - 1)
    cols = [q[:, i].copy() for i in range(points.shape[1])]
    return _hilbert_from_quantized(cols, bits, np.where)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _flood_kernel(
    pair_s_ref,  # scalar prefetch: (P,) simplex-block id per pair
    pair_c_ref,  # scalar prefetch: (P,) witness-chunk id per pair
    pair_first_ref,  # scalar prefetch: (P,) 1 if first pair of its block
    samples_ref,  # (BS, NR, dim, RT) ball-local sample coordinates
    wit_ref,  # (dim, WCHUNK) witness chunk (transposed storage: a
    #           (W, small-d) HBM buffer would be lane-padded 128/d-fold)
    cent_ref,  # (BS, dim) ball centers
    rad_ref,  # (BS, 1) ball radii
    tile_lo_ref,  # (BS, NR, dim) sample-tile bbox lower corner (ball-local)
    tile_hi_ref,  # (BS, NR, dim) sample-tile bbox upper corner
    ub2_ref,  # (BS, NR, 1) squared upper bound on each tile's min-distance
    acc_ref,  # (BS, NR, RT) accumulator carried across launches (aliased)
    out_ref,  # (BS, NR, RT) running min of squared distances
    tile_ok_ref,  # scratch (NR, 1) int32: per-tile admission bits
    admit_ref,  # scratch (BS, NSUB) int32: per-(simplex, sub-chunk) bits
    *,
    bs: int,
    dim: int,
    nsub: int,
    sub: int,
):
    p = pl.program_id(0)

    # First visit of this output block in this launch: seed from the
    # cross-launch accumulator (the aliased HBM buffer holds the running
    # min of all previous segments; inf before the first one).
    @pl.when(pair_first_ref[p] == 1)
    def _init():
        out_ref[:] = acc_ref[:]

    nr = samples_ref.shape[1]
    rt = samples_ref.shape[3]
    # one small on-chip transpose per chunk; everything below works on
    # (SUB, dim) witness tiles
    y_all = jnp.transpose(wit_ref[:])  # (WCHUNK, dim)

    # Per-simplex adaptive bounds, read ONCE per pair (stale within the
    # pair — conservative): the worst running min over all of a simplex's
    # samples. A sub-chunk whose gap to the simplex's sample bbox exceeds
    # it cannot change anything. Chunks are visited nearest-first, so this
    # collapses to ~the covering radius after each block's first pair.
    s_bounds = jnp.max(jnp.max(out_ref[:], axis=2), axis=1)  # (BS,)
    samp_lo = jnp.min(tile_lo_ref[:], axis=1)  # (BS, dim) ball-local
    samp_hi = jnp.max(tile_hi_ref[:], axis=1)  # (BS, dim)

    # Admission for ALL (simplex, sub-chunk) combinations in one
    # vectorized pass. The scalar formulation (bs*nsub serialized
    # iterations of (1, dim) ops) was measured on hardware at ~11.4 us
    # of overhead PER GRID STEP — 0.46 s of the 1.10 s kernel time at
    # the 1M x 1k headline (tpu_runs/kstats_1m1k.json; an UPPER bound:
    # the zeroed-radius probe still admits sub-chunks whose bbox
    # contains a ball center, leaking some tile compute into it) —
    # because every tiny op still issues as a full-width VPU
    # instruction. Batched over (BS, NSUB) the same tests are ~a dozen
    # instructions total; the loop below degenerates to scalar bit
    # reads.
    ysub = y_all.reshape(nsub, sub, dim)
    box_lo_all = jnp.min(ysub, axis=1)  # (NSUB, dim)
    box_hi_all = jnp.max(ysub, axis=1)  # (NSUB, dim)
    c_all = cent_ref[:]  # (BS, dim)
    r2_all = rad_ref[:] * rad_ref[:]  # (BS, 1)
    near_all = (
        jnp.clip(c_all[:, None, :], box_lo_all[None], box_hi_all[None])
        - c_all[:, None, :]
    )  # (BS, NSUB, dim)
    near_d2_all = jnp.sum(near_all * near_all, axis=2)  # (BS, NSUB)
    blo_all = box_lo_all[None] - c_all[:, None, :]  # ball-local boxes
    bhi_all = box_hi_all[None] - c_all[:, None, :]
    sgap_all = jnp.maximum(
        jnp.maximum(
            blo_all - samp_hi[:, None, :], samp_lo[:, None, :] - bhi_all
        ),
        0.0,
    )
    sgap2_all = jnp.sum(sgap_all * sgap_all, axis=2)  # (BS, NSUB)
    admit_ref[:] = jnp.logical_and(
        near_d2_all <= r2_all, sgap2_all <= s_bounds[:, None]
    ).astype(jnp.int32)

    for isub in range(nsub):
        y = y_all[isub * sub : (isub + 1) * sub, :]  # (SUB, dim)
        for s in range(bs):
            adm = admit_ref[s : s + 1, isub : isub + 1]  # (1, 1)

            @pl.when(adm[0, 0] == 1)
            def _compute(s=s, y=y):
                c_s = cent_ref[s : s + 1, :]  # (1, dim)
                r2 = (
                    rad_ref[s : s + 1, :] * rad_ref[s : s + 1, :]
                )  # (1, 1)
                # sub-chunk box in ball-local coordinates (tile gap
                # tests); recomputed only on admitted combinations
                box_lo = jnp.min(y, axis=0, keepdims=True)
                box_hi = jnp.max(y, axis=0, keepdims=True)
                blo = box_lo - c_s
                bhi = box_hi - c_s
                # Tile-level skips, vectorized over ALL tiles at once
                # (both exact):
                # 1. static bound: the tile's distance to its nearest
                #    simplex vertex (valid when landmarks ⊆ witnesses;
                #    +inf otherwise),
                # 2. adaptive branch-and-bound: the tile's current worst
                #    running min — a sub-chunk whose box gap exceeds it
                #    cannot improve any sample in the tile.
                # Computing the (NR,) admission vector up front replaces
                # NR serialized (1, dim) gap ops + (1, RT) reads per
                # sub-chunk and lets the witness-mask computation below
                # run only when at least one tile needs it — the per-
                # sub-chunk fixed overhead used to rival the tile
                # arithmetic itself.
                tlo = tile_lo_ref[s]  # (NR, dim)
                thi = tile_hi_ref[s]  # (NR, dim)
                gap = jnp.maximum(jnp.maximum(blo - thi, tlo - bhi), 0.0)
                gap2 = jnp.sum(gap * gap, axis=1, keepdims=True)  # (NR, 1)
                pm = jnp.max(out_ref[s], axis=1, keepdims=True)  # (NR, 1)
                bound = jnp.minimum(pm, ub2_ref[s])  # (NR, 1)
                # int32 bits staged through scratch: the tile loop below
                # reads them back per-r via a ref dynamic slice (scalar
                # extraction of a traced-index vector element can't lower)
                tile_ok_ref[:] = (gap2 <= bound).astype(jnp.int32)

                @pl.when(jnp.max(tile_ok_ref[:]) == 1)
                def _tiles():
                    yl = y - c_s  # (SUB, dim) ball-local witnesses
                    y2 = jnp.sum(yl * yl, axis=1, keepdims=True)  # (SUB, 1)
                    # Mask by moving rejected witnesses far away:
                    # (big − x)² saturates and drops out of the min — no
                    # per-element select. (3e18² ≈ 9e36 stays finite in
                    # f32, and dominates every in-ball distance in both
                    # the coordinate-loop and MXU formulations.)
                    ymask = jnp.where(y2 <= r2, yl, jnp.float32(3e18))

                    def r_body(r, carry):
                        ok = tile_ok_ref[pl.ds(r, 1), :]  # (1, 1)

                        @pl.when(ok[0, 0] == 1)
                        def _tile(r=r):
                            prev = out_ref[s, pl.ds(r, 1), :]  # (1, RT)
                            x = samples_ref[s, r]  # (dim, RT)
                            # Per-coordinate VPU accumulation. The MXU
                            # |y|²−2y·x+|x|² formulation was measured on
                            # hardware (sweep 2026-08-18) at 2-12x SLOWER
                            # at every RT — the f32-HIGHEST multi-pass it
                            # needs for the 5e-4 oracle tolerance erases
                            # the systolic-array win at dim=2..3.
                            d2 = jnp.zeros(
                                (sub, rt), dtype=jnp.float32
                            )
                            for i in range(dim):
                                diff = (
                                    ymask[:, i : i + 1]
                                    - x[i : i + 1, :]
                                )
                                d2 = d2 + diff * diff
                            cmin = jnp.min(d2, axis=0, keepdims=True)
                            out_ref[s, pl.ds(r, 1), :] = jnp.minimum(
                                prev, cmin
                            )

                        return carry

                    jax.lax.fori_loop(0, nr, r_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("bs", "dim", "nsub", "sub", "interpret"),
    donate_argnums=(10,),
)
def _flood_pairs_call(
    pair_s,
    pair_c,
    pair_first,
    samples,  # (SB*BS, NR, dim, RT) ball-local
    witnesses,  # (dim, W) transposed storage
    centers,  # (SB*BS, dim)
    radii,  # (SB*BS, 1)
    tile_lo,  # (SB*BS, NR, dim)
    tile_hi,  # (SB*BS, NR, dim)
    ub2,  # (SB*BS, NR, 1)
    acc,  # (SB*BS, NR, RT) running min (donated/aliased in place)
    *,
    bs: int,
    dim: int,
    nsub: int,
    sub: int,
    interpret: bool,
):
    npairs = pair_s.shape[0]
    nr = samples.shape[1]
    rt = samples.shape[3]
    wchunk = nsub * sub

    kernel = functools.partial(
        _flood_kernel, bs=bs, dim=dim, nsub=nsub, sub=sub
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(npairs,),
            in_specs=[
                pl.BlockSpec(
                    (bs, nr, dim, rt),
                    lambda p, ps, pc, pf: (ps[p], 0, 0, 0),
                ),
                pl.BlockSpec(
                    (dim, wchunk),
                    lambda p, ps, pc, pf: (0, pc[p]),
                ),
                pl.BlockSpec(
                    (bs, dim),
                    lambda p, ps, pc, pf: (ps[p], 0),
                ),
                pl.BlockSpec(
                    (bs, 1),
                    lambda p, ps, pc, pf: (ps[p], 0),
                ),
                pl.BlockSpec(
                    (bs, nr, dim),
                    lambda p, ps, pc, pf: (ps[p], 0, 0),
                ),
                pl.BlockSpec(
                    (bs, nr, dim),
                    lambda p, ps, pc, pf: (ps[p], 0, 0),
                ),
                pl.BlockSpec(
                    (bs, nr, 1),
                    lambda p, ps, pc, pf: (ps[p], 0, 0),
                ),
                pl.BlockSpec(
                    (bs, nr, rt),
                    lambda p, ps, pc, pf: (ps[p], 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (bs, nr, rt),
                lambda p, ps, pc, pf: (ps[p], 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((nr, 1), jnp.int32),
                pltpu.VMEM((bs, nsub), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(acc.shape, jnp.float32),
        # alias the accumulator input onto the output: untouched blocks
        # keep their previous values, touched blocks are re-seeded from
        # the accumulator at their first pair of this launch
        input_output_aliases={10: 0},
        # wide-tile variants (RT sweep / batched MXU dot) carry (SUB, RT)
        # f32 intermediates past the default 16MB scoped VMEM budget
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
            if rt > 2048
            else None
        ),
        interpret=interpret,
    )(
        pair_s, pair_c, pair_first, samples, witnesses, centers, radii,
        tile_lo, tile_hi, ub2, acc,
    )
    return out


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("wchunk", "bs"))
def _active_pairs_matrix(
    centers, radii, samp_lo, samp_hi, ub2max, chunk_lo, chunk_hi, wchunk, bs
):
    """Per (simplex block, witness chunk): can the chunk matter, and how
    close is it?

    A chunk is active for a simplex when (a) its bounding box intersects
    the simplex's ball (the reference's mask semantics) AND (b) its gap to
    the simplex's sample bounding box does not exceed the simplex's static
    upper bound on min-distances (+inf unless landmarks ⊆ witnesses; exact
    — see the kernel's tile-level bound for the argument).

    Returns:
        (active (n_sblocks, n_chunks) bool, dist2 (n_sblocks, n_chunks)):
        ``dist2`` is the min over the block's centers of the squared
        center-to-chunk-box distance — used to visit each block's chunks
        nearest-first so the kernel's adaptive bound tightens immediately.
    """
    s_total = centers.shape[0]
    n_sblocks = s_total // bs
    c = centers.reshape(n_sblocks, bs, -1)
    r = radii.reshape(n_sblocks, bs)
    nearest = jnp.clip(
        c[:, :, None, :], chunk_lo[None, None, :, :], chunk_hi[None, None, :, :]
    )
    d2 = jnp.sum((c[:, :, None, :] - nearest) ** 2, axis=-1)
    # strict exclusion of zero-radius padding simplices (real radii carry
    # a +1e-3 slack, so no real ball has radius 0)
    hit = jnp.logical_and(d2 <= (r[:, :, None] ** 2), r[:, :, None] > 0)

    slo = samp_lo.reshape(n_sblocks, bs, 1, -1)
    shi = samp_hi.reshape(n_sblocks, bs, 1, -1)
    gap = jnp.maximum(
        jnp.maximum(chunk_lo[None, None, :, :] - shi, slo - chunk_hi[None, None, :, :]),
        0.0,
    )
    gap2 = jnp.sum(gap * gap, axis=-1)
    hit = jnp.logical_and(hit, gap2 <= ub2max.reshape(n_sblocks, bs, 1))
    return jnp.any(hit, axis=1), jnp.min(d2, axis=1)


def _sample_morton_order(weights_np: np.ndarray) -> np.ndarray:
    """Space-filling-curve order of barycentric sample rows.

    Sample tiles are contiguous runs of RT rows; curve-sorting the rows
    makes every tile a spatially tight patch of the simplex (for *any*
    simplex — the weight→point map is affine), which tightens the kernel's
    per-tile bounding boxes and static bounds and lets it skip more work.
    The engine inverse-permutes its output columns, so callers see the
    original row order. Hilbert order is used (Z-order remains only as
    the 1-column fallback where the two coincide): Hilbert tiles have no
    Z-jumps, so their bounding boxes are tighter — the static work-volume
    model prices Z-order at +6.6% admitted tile units on the 100k/300
    cloud (287,767 Hilbert vs 306,638 Morton,
    tpu_runs/wv_100k300_sample_morton.json), so the former
    FLOODER_SAMPLE_CURVE knob was deleted with Hilbert hardcoded.
    """
    k = weights_np.shape[1]
    bits = max(1, min(10, 24 // max(1, k)))
    if k > 1:
        code = hilbert_codes_np(weights_np.astype(np.float64), bits)
        return np.argsort(code, kind="stable").astype(np.int32)
    q = np.clip(
        (weights_np * (2**bits - 1)).astype(np.int64), 0, 2**bits - 1
    )
    code = np.zeros(len(weights_np), dtype=np.int64)
    for b in range(bits):
        for ax in range(k):
            code |= ((q[:, ax] >> b) & 1) << (b * k + ax)
    return np.argsort(code, kind="stable").astype(np.int32)


# A/B knob for the hardware sweep of the packed admission fetch
# ("u8" per-block-quantized / "f16" globally-normalized / "f32" legacy
# pair); the losers are deleted once the sweep decides. The admission
# matrix is fetched device→host on the hot path of every call, and the
# tunnel D2H runs at ~16-35 MB/s past a ~24 ms latency floor
# (tools/tunnel_rtt_probe.py; 10M×1k prep stage = 1.22 s for the 42 MB
# legacy fetch, session …_093420_r5compile.log) — bytes/entry is the
# whole stage.
PACK_ADMISSION = os.environ.get("FLOODER_ADMISSION", "u8").strip().lower()
if PACK_ADMISSION not in ("u8", "f16", "f32"):
    PACK_ADMISSION = "u8"


def unpack_admission(adm_host):
    """Host-side admission unpack: (active bool, nearest-first sort key).

    ``adm_host`` is the packed uint8 matrix (255 = inactive, 0..254 =
    per-block distance rank), the packed float16 matrix (``inf`` =
    inactive, finite = normalized squared block→chunk distance), or the
    legacy (bool, float32) pair — see ``_prep(pack=...)``.
    """
    if isinstance(adm_host, tuple):
        return adm_host
    if adm_host.dtype == np.uint8:
        return adm_host != 255, adm_host
    return np.isfinite(adm_host), adm_host


def select_pad_pair(active: np.ndarray, dist: np.ndarray | None = None):
    """Pick a (block, chunk) pair for padding a work-list segment.

    The pad must come from a FULLY-inactive block (typically a
    zero-radius padding block): an inactive entry of a block that also
    has real pairs in the same segment would be a non-consecutive
    revisit — its first-visit flag reseeds ``out_ref`` from the aliased
    accumulator, whose write-back from the block's earlier visit is not
    ordered against this input DMA within one launch. Returns None when
    every block has active pairs; callers then pad by repeating the last
    real pair (same block → first flag stays 0, the min-fold is
    idempotent).

    Args:
        active: (n_blocks, n_chunks) bool admission matrix.
        dist: optional (n_blocks, n_chunks) block-to-chunk distance
            keys; when given, the farthest chunk of the pad block is
            chosen (its admission check fails fastest). With a packed
            admission the pad block's row is all-inactive (inf/255), so
            argmax degenerates to chunk 0 — harmless: the pad block's
            balls have radius 0, so the in-kernel ball test rejects
            every chunk equally fast.
    """
    rows = np.nonzero(~active.any(axis=1))[0]
    if not len(rows):
        return None
    r0 = int(rows[0])
    c0 = int(np.argmax(dist[r0])) if dist is not None else 0
    return (np.int32(r0), np.int32(c0))


def _tile_geometry(r_count: int):
    """Sample-tile geometry: (rt lanes per tile, nr tiles, padded total)."""
    rt = min(RT, _round_up(r_count, 128))
    nr = -(-r_count // rt)
    return rt, nr, nr * rt


def _pad_simplices(verts, centers, radii, s_total: int):
    """Pad a simplex batch to ``s_total`` rows with far-away zero-radius
    balls: they intersect no witness chunk, so padding adds no work-list
    pairs (output rows are sliced off by the caller)."""
    num = verts.shape[0]
    if s_total == num:
        return verts, centers, radii
    pad_n = s_total - num
    _, k, dim = verts.shape
    verts = jnp.concatenate(
        [verts, jnp.full((pad_n, k, dim), 8e14, verts.dtype)]
    )
    centers = jnp.concatenate(
        [centers, jnp.full((pad_n, dim), 8e14, centers.dtype)]
    )
    radii = jnp.concatenate([radii, jnp.zeros((pad_n,), radii.dtype)])
    return verts, centers, radii


def _prepare_sample_weights(weights, r2_total: int):
    """Curve-sort the sample weight rows and pad to the tile grid.

    Returns (device weights (r2_total, k), sperm) where ``sperm`` is the
    applied permutation — callers inverse-permute their output columns.
    Padding repeats the last row (keeps the final tile's box tight;
    duplicate samples are harmless under min).

    Cached by content: in grid mode the weights are a pure function of
    (points_per_edge, dim), identical across every call and every cloud,
    so the host Hilbert sort and the device transfer are paid once.
    """
    weights_np = np.asarray(weights, dtype=np.float32)
    return _prepare_sample_weights_cached(
        weights_np.tobytes(), weights_np.shape, r2_total
    )


@functools.lru_cache(maxsize=32)
def _prepare_sample_weights_cached(wbytes: bytes, shape, r2_total: int):
    weights_np = np.frombuffer(wbytes, dtype=np.float32).reshape(shape)
    sperm = _sample_morton_order(weights_np)
    ws = weights_np[sperm]
    if r2_total != len(ws):
        ws = np.concatenate(
            [ws, np.repeat(ws[-1:], r2_total - len(ws), axis=0)]
        )
    return jnp.asarray(ws), sperm


def spatial_order_np(centers, bits: int) -> np.ndarray:
    """Hilbert processing order of simplices (host numpy: the centers are
    small and a device sort costs more in dispatch latency than the whole
    computation on host). Matching the witness curve keeps blocks of
    consecutive simplices spatially tight."""
    c = np.asarray(centers)
    code = hilbert_codes_np(c, bits) if c.shape[1] > 1 else c[:, 0]
    return np.argsort(code, kind="stable")


@functools.partial(
    jax.jit, static_argnames=("bs", "nr", "rt", "tight", "wchunk", "pack")
)
def _prep(
    verts_local,  # (S, k, dim) ball-local vertex coordinates
    weights_p,  # (R2, k) padded, Morton-ordered sample weights
    centers,  # (S, dim)
    radii,  # (S,)
    chunk_lo,  # (n_chunks, dim)
    chunk_hi,  # (n_chunks, dim)
    *,
    bs: int,
    nr: int,
    rt: int,
    tight: bool,
    wchunk: int,
    pack: str = "u8",
):
    """One fused dispatch for all kernel-operand preparation.

    Produces the sample tiles, per-tile bounding boxes, static upper
    bounds, and the active-pair admission in a single XLA program (the
    round-1 version dispatched ~a dozen eager ops here, ~0.2-0.4 s of
    non-kernel tail at 1M points).

    ``pack`` selects the admission encoding fetched to host every call
    (the tunnel D2H is bandwidth-bound past a ~24 ms floor, see
    tools/tunnel_rtt_probe.py, so bytes/entry is the whole cost):
    ``"u8"`` — ONE uint8 matrix, 255 = inactive, 0..254 = the chunk's
    distance quantized over its block's own active range (1 byte/entry,
    5× smaller than legacy; 42 MB → 8.4 MB at 10M×1k); ``"f16"`` — ONE
    float16 matrix of ``dist2 / bbox_diag2`` (inf = inactive; values are
    in [0, 1] because block centers lie in the landmark hull ⊆ the
    witness bbox, so f16 cannot overflow); ``"f32"`` — the legacy
    (bool, float32) pair. Hosts recover ``active`` and the nearest-first
    visit ORDER via ``unpack_admission``; quantization merely creates
    harmless ordering ties.
    """
    s_total, k, dim = verts_local.shape
    samples_flat = jnp.einsum(
        "rk,skd->srd",
        weights_p,
        verts_local,
        precision=jax.lax.Precision.HIGHEST,
    )  # (S, R2, dim) ball-local
    samples_t = samples_flat.reshape(s_total, nr, rt, dim)
    samples = jnp.transpose(samples_t, (0, 1, 3, 2))  # (S, NR, dim, RT)

    tile_lo = jnp.min(samples_t, axis=2)  # (S, NR, dim)
    tile_hi = jnp.max(samples_t, axis=2)
    if tight:
        dv2 = None
        for j in range(k):
            dj = samples_flat - verts_local[:, j : j + 1, :]
            dj2 = jnp.sum(dj * dj, axis=-1)  # (S, R2)
            dv2 = dj2 if dv2 is None else jnp.minimum(dv2, dj2)
        ub2 = jnp.max(dv2.reshape(s_total, nr, rt), axis=2)[..., None]
    else:
        ub2 = jnp.full((s_total, nr, 1), jnp.inf, dtype=jnp.float32)

    samp_lo_g = jnp.min(tile_lo, axis=1) + centers  # (S, dim) global
    samp_hi_g = jnp.max(tile_hi, axis=1) + centers
    ub2max = ub2[:, :, 0].max(axis=1)  # (S,)
    active, pairdist = _active_pairs_matrix(
        centers, radii, samp_lo_g, samp_hi_g, ub2max,
        chunk_lo, chunk_hi, wchunk, bs,
    )
    if pack == "f16":
        ext = jnp.max(chunk_hi, axis=0) - jnp.min(chunk_lo, axis=0)
        scale2 = jnp.sum(ext * ext) + 1e-30
        adm = jnp.where(active, pairdist / scale2, jnp.inf)
        return samples, tile_lo, tile_hi, ub2, adm.astype(jnp.float16)
    if pack == "u8":
        # Per-block normalization: quantize each block's ACTIVE chunk
        # distances over that block's own [min, max] range to 0..254
        # (255 = inactive). The host uses these values only as the
        # nearest-first visit ORDER within a block, so 254 levels of the
        # block's own range beat a global quantization by orders of
        # magnitude in fidelity (a block's active chunks span a tiny
        # slice of the cloud-wide distance range).
        d2a = jnp.where(active, pairdist, jnp.inf)
        rmin = jnp.min(d2a, axis=1, keepdims=True)
        rmax = jnp.max(jnp.where(active, pairdist, -jnp.inf),
                       axis=1, keepdims=True)
        q = (d2a - rmin) / jnp.maximum(rmax - rmin, 1e-30) * 254.0
        q = jnp.nan_to_num(q, nan=255.0, posinf=255.0)
        adm = jnp.where(active, jnp.clip(q, 0.0, 254.0), 255.0)
        return samples, tile_lo, tile_hi, ub2, adm.astype(jnp.uint8)
    return samples, tile_lo, tile_hi, ub2, (active, pairdist)


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
        del wchunk  # pallas block geometry is fixed by the kernel
        self.wchunk = WCHUNK
        n, dim = points.shape
        self.dim = dim
        bits = max(1, min(10, MORTON_BITS_TOTAL // dim))
        total = _round_up(max(n, self.wchunk), self.wchunk)
        # Bucket the chunk count to a power of two: the witness array shape
        # is a kernel compile key, so bucketing lets differently-sized
        # clouds reuse compiled kernels (the cold-compile cliff fix).
        n_chunks = 1 << max(0, (total // self.wchunk) - 1).bit_length()
        total = n_chunks * self.wchunk
        # Witness ordering: balanced k-d (segmented median splits; ~1.6x
        # tighter sub-chunk boxes by volume than Hilbert runs). Decided by
        # two hardware sweeps at the 1M x 1k headline: vs_baseline
        # 0.9642/0.9986 vs Hilbert's 0.9913 at sha 5f087e2
        # (tpu_runs/sweep_r04.jsonl) and 0.975 vs 1.016 at HEAD 17fb1cc
        # with 5 reps each in one session (tpu_runs/sweep_r05.jsonl);
        # the Hilbert witness path was deleted per the adopt-the-winner
        # rule (samples and simplex centers still order by Hilbert).
        #
        # Pad to the bucketed total BEFORE ordering by repeating real
        # points (cyclic): duplicates are idempotent under min and
        # keep every leaf box tight (far-sentinel rows would blow up
        # the boxes of the leaves they land in).
        pts_padded = points
        if total != n:
            reps = jnp.tile(points, (-(-total // n), 1))[: total - n]
            pts_padded = jnp.concatenate([points, reps], axis=0)
        with stage("engine-init:kd-order"):
            if use_host_kd(total, SUB):
                # small cloud: host ordering, zero device compile
                order = jnp.asarray(
                    kd_order_np(np.asarray(pts_padded), leaf=SUB)
                )
            else:
                order = kd_order_device(pts_padded, leaf=SUB)
            fence(order)
        with stage("engine-init:permute+boxes"):
            pts_sorted = pts_padded[order]
            # Transposed (dim, W) storage: the kernel's HBM buffer layout
            # pads the minor dimension to 128 lanes, so (W, small-d)
            # storage would cost 128/d× its size (20 GB for 40M 2-D
            # points).
            self.witnesses = jnp.transpose(pts_sorted)
            self._bits = bits
            chunks = pts_sorted.reshape(n_chunks, self.wchunk, dim)
            self.chunk_lo = jnp.min(chunks, axis=1)
            self.chunk_hi = jnp.max(chunks, axis=1)
            fence(self.witnesses, self.chunk_lo, self.chunk_hi)

    def order(self, centers: jax.Array) -> np.ndarray:
        return spatial_order_np(centers, self._bits)

    def min_distances(
        self, verts, weights, centers, radii, batch_size, tight=False
    ):
        del batch_size  # block geometry is fixed by the kernel
        acc, sperm, num_simplices, s_total, r2_total = self._run_kernel(
            verts, weights, centers, radii, tight
        )
        out = acc.reshape(s_total, r2_total)[:num_simplices]
        # Undo the Morton sample permutation: column i holds original
        # sample sperm[i].
        inv = np.argsort(sperm)
        return jnp.sqrt(_inf_masked(out[:, jnp.asarray(inv)]))

    def min_distances_facemax(
        self, verts, weights, centers, radii, batch_size, tight=False,
        face_tables=None,
    ):
        """Run the kernel and reduce to per-face maxima in ONE epilogue
        dispatch on the squared accumulator.

        The unfused path materializes the full (S, R) sqrt'd,
        inverse-permuted distance matrix and then re-dispatches a gather +
        max per codimension (the reference extracts face values the same
        two-step way, core.py:251-276). Fusing skips the (S, R)
        materialization entirely: the face index tables are composed with
        the sample permutation on host, the maxima are taken over squared
        values (max and sqrt commute), and only the tiny (S, F) results are
        ever produced.

        Args:
            face_tables: list of (F_c, m_c) index tables (one per
                codimension) into the ORIGINAL sample rows, or None for a
                single max over all samples (random mode).

        Returns:
            tuple of (S, F_c) arrays, or a single (S,) array when
            ``face_tables`` is None.
        """
        del batch_size
        acc, sperm, num_simplices, s_total, r2_total = self._run_kernel(
            verts, weights, centers, radii, tight
        )
        acc2 = acc.reshape(s_total, r2_total)
        if face_tables is None:
            # padded sample columns repeat a real row — harmless under max
            return _max_sqrt_epilogue(acc2)[:num_simplices]
        inv = np.argsort(sperm)
        tables = tuple(
            jnp.asarray(inv[np.asarray(t, dtype=np.int64)], dtype=jnp.int32)
            for t in face_tables
        )
        outs = _facemax_epilogue(acc2, tables)
        return tuple(o[:num_simplices] for o in outs)

    def _run_kernel(self, verts, weights, centers, radii, tight):
        num_simplices, k, dim = verts.shape
        r_count = weights.shape[0]
        # Bucket the simplex-block count to a power of two: the output shape
        # is part of the kernel compile key, and cold TPU kernel compiles
        # are expensive — buckets make repeat clouds hit the compile cache.
        n_sblocks = 1 << max(0, (-(-num_simplices // BS) - 1)).bit_length()
        s_total = n_sblocks * BS
        rt, nr, r2_total = _tile_geometry(r_count)

        verts, centers, radii = _pad_simplices(
            verts, centers, radii, s_total
        )
        # Curve-order the sample rows (host: weights are small) so every
        # RT-tile is a spatially tight patch — tighter tile boxes/bounds,
        # more kernel skips (see _sample_morton_order). Output columns are
        # inverse-permuted below.
        weights_p, sperm = _prepare_sample_weights(weights, r2_total)
        verts_local = verts - centers[:, None, :]

        # All kernel-operand prep — ball-local sample tiles laid out
        # (S, NR, dim, RT), per-tile bounding boxes, static upper bounds
        # (``tight``: every sample's min distance is bounded by its
        # distance to the nearest simplex vertex when landmarks ⊆
        # witnesses — provably lossless skipping), and the active-pair
        # matrix — in ONE fused dispatch, then a single host transfer.
        with stage("prep:fused-dispatch"):
            samples, tile_lo, tile_hi, ub2, adm_dev = _prep(
                verts_local, weights_p, centers, radii,
                self.chunk_lo, self.chunk_hi,
                bs=BS, nr=nr, rt=rt, tight=tight, wchunk=self.wchunk,
                pack=PACK_ADMISSION,
            )
            active, pairdist = unpack_admission(jax.device_get(adm_dev))
            fence(samples, tile_lo, tile_hi, ub2)
        with stage("prep:worklist-host"):
            pair_s_np, pair_c_np = np.nonzero(active)  # row-major: by s
            # Within each block, visit chunks nearest-first: the kernel's
            # adaptive branch-and-bound skip tightens after the closest
            # chunk.
            order = np.lexsort((pairdist[pair_s_np, pair_c_np], pair_s_np))
            pair_s_np = pair_s_np[order].astype(np.int32)
            pair_c_np = pair_c_np[order].astype(np.int32)
        note(
            f"worklist: {len(pair_s_np)} pairs over "
            f"{active.shape[0]} blocks x {active.shape[1]} chunks "
            f"({len(pair_s_np) / max(1, active.size):.4%}), "
            f"nr={nr} rt={rt} s_total={s_total}"
        )

        radii2 = radii[:, None]

        def run_pairs(ps_np, pc_np, acc):
            """Run a (block-major, already-ordered) pair list through the
            kernel in fixed-size segments. Scalar-prefetch operands live in
            the chip's 1MB SMEM, and a fixed segment length keeps the grid
            (a compile key) stable across clouds. The running min is
            carried across launches through the aliased accumulator;
            blocks untouched by every segment simply keep their values."""
            seg_len = PAIR_SEGMENT
            if self.interpret:
                # interpreter: right-size the segment (no compile cache
                # to protect; smaller grids keep tests fast)
                seg_len = max(256, 1 << max(0, len(ps_np) - 1).bit_length())
                seg_len = min(seg_len, PAIR_SEGMENT)
            nseg = max(1, -(-len(ps_np) // seg_len))
            total_pairs = nseg * seg_len
            if total_pairs != len(ps_np):
                pad = total_pairs - len(ps_np)
                if len(ps_np):
                    # repeat the last pair: the min-fold is idempotent
                    ps_np = np.concatenate([ps_np, np.repeat(ps_np[-1:], pad)])
                    pc_np = np.concatenate([pc_np, np.repeat(pc_np[-1:], pad)])
                else:
                    ps_np = np.zeros(pad, dtype=np.int32)
                    pc_np = np.zeros(pad, dtype=np.int32)
            # Mosaic rejects int64 index arithmetic; trace the kernel in
            # x32 mode regardless of the process-wide x64 setting.
            with _x32_mode():
                for g in range(nseg):
                    sl = slice(g * seg_len, (g + 1) * seg_len)
                    seg_s = ps_np[sl]
                    seg_c = pc_np[sl]
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
                        tile_lo,
                        tile_hi,
                        ub2,
                        acc,
                        bs=BS,
                        dim=dim,
                        nsub=WCHUNK // SUB,
                        sub=SUB,
                        interpret=self.interpret,
                    )
            return acc

        acc = jnp.full((s_total, nr, rt), jnp.inf, dtype=jnp.float32)
        # Single static-bound pass. A two-phase bound refresh (run the
        # nearest chunk(s) of every block, realize per-simplex bounds,
        # rebuild and re-dispatch the shrunk work-list) was built and
        # priced in rounds 3-4; the 2026-08-18 hardware sweep measured it
        # +0.24 s SLOWER at the 1M headline (the host round-trip and the
        # second dispatch cost more than the dropped tiles saved), so the
        # mechanism was deleted (tpu_runs/sweep_r04.jsonl).
        with stage("kernel:segments"):
            acc = run_pairs(pair_s_np, pair_c_np, acc)
            fence(acc)
        return acc, sperm, num_simplices, s_total, r2_total


# Squared distances at or above this are the in-kernel mask constant
# (out-of-ball witnesses are moved to coordinate 3e18, so a sub-chunk
# whose witnesses are ALL outside the ball yields ≥ 9e36) — semantically
# "no witness in the ball", which the dense engine reports as +inf.
# Real squared distances are < 1e30 for any coordinates below ~1e15.
# (plain float: module import must never touch the JAX backend)
_MASKED_D2 = 1e30


def _inf_masked(acc2):
    return jnp.where(acc2 >= _MASKED_D2, jnp.inf, acc2)


@jax.jit
def _max_sqrt_epilogue(acc2):
    return jnp.sqrt(_inf_masked(jnp.max(acc2, axis=-1)))


@jax.jit
def _facemax_epilogue(acc2, tables):
    return tuple(
        jnp.sqrt(_inf_masked(jnp.max(jnp.take(acc2, t, axis=1), axis=-1)))
        for t in tables
    )
