"""Multi-chip scaling via jax.sharding + shard_map.

The reference is strictly single-device (SURVEY §2: no DP/TP/PP/SP, no
collectives anywhere; scale is handled by streaming batches on one GPU).
The natural TPU-native scale-out (SURVEY §5) uses a 2-D device mesh:

- ``"simplex"`` axis — data-parallel over simplex batches (embarrassingly
  parallel, no collectives),
- ``"witness"`` axis — the point cloud itself is sharded; each device
  min-reduces over its witness shard and the partial minima combine with a
  single ``lax.pmin`` over ICI (min is associative, so this composes
  exactly).

Witness sharding is what lets clouds larger than one chip's HBM
(hundreds of millions of points) stream through the same pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.flood import WITNESS_PAD, _round_up, batch_windows

SIMPLEX_AXIS = "simplex"
WITNESS_AXIS = "witness"


def balance_chunk_assignment(loads: np.ndarray, n_bins: int) -> np.ndarray:
    """Capacity-constrained LPT assignment of witness chunks to shards.

    SPMD runs every witness shard for the busiest shard's segment count,
    so shard loads should be equal — but contiguous Hilbert-range slices
    are not (dense regions cluster, and the bucketing pad chunks all land
    in the last shard: measured max/mean up to 1.45 at 100k/300, capping
    8-way witness sharding at ~5.5x). Chunk identity is arbitrary — the
    kernel min-reduces each chunk independently — so chunks can be
    permuted freely before slicing.

    Greedy longest-processing-time with equal bin capacity: sort chunks
    by load descending, place each in the lightest shard with space.

    Args:
        loads: (n_chunks,) per-chunk load (active-pair count).
        n_bins: number of witness shards; must divide n_chunks.

    Returns:
        (n_chunks,) permutation ``perm`` such that new position j holds
        old chunk ``perm[j]`` and positions [i*cap, (i+1)*cap) form
        shard i's chunks.
    """
    n_chunks = len(loads)
    assert n_chunks % n_bins == 0
    cap = n_chunks // n_bins
    bins = [[] for _ in range(n_bins)]
    bin_load = np.zeros(n_bins)
    for c in np.argsort(-np.asarray(loads), kind="stable"):
        open_bins = [b for b in range(n_bins) if len(bins[b]) < cap]
        b = min(open_bins, key=lambda i: (bin_load[i], i))
        bins[b].append(int(c))
        bin_load[b] += loads[c]
    return np.asarray([c for b in bins for c in b], dtype=np.int32)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    simplex_parallel: Optional[int] = None,
) -> Mesh:
    """Build a ("simplex", "witness") mesh over the given devices.

    Args:
        devices: devices to use (default: all).
        simplex_parallel: requested size of the simplex (data-parallel)
            axis; the witness axis gets the remaining factor. Clamped to
            the largest divisor of the device count that is <= the request
            (so odd device counts and over-asks degrade gracefully instead
            of raising). Default: all devices on the simplex axis (no
            collectives needed).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if simplex_parallel is None:
        simplex_parallel = n
    simplex_parallel = max(1, min(int(simplex_parallel), n))
    while n % simplex_parallel != 0:
        simplex_parallel -= 1
    arr = np.asarray(devices).reshape(simplex_parallel, n // simplex_parallel)
    return Mesh(arr, (SIMPLEX_AXIS, WITNESS_AXIS))


@partial(
    jax.jit,
    static_argnames=("mesh", "wchunk", "sort_axis"),
)
def sharded_flood_min_distances(
    verts: jax.Array,
    weights: jax.Array,
    centers: jax.Array,
    radii: jax.Array,
    witnesses: jax.Array,
    *,
    mesh: Mesh,
    wchunk: int = 1024,
    sort_axis: int = 0,
) -> jax.Array:
    """Sharded version of the flood min-distance reduction.

    Args:
        verts: (nb, B, k, d) — ``nb`` must divide by the simplex-axis size.
        weights: (R, k) sample weights (replicated).
        centers/radii: (nb, B, d) / (nb, B).
        witnesses: (W, d) sorted along ``sort_axis`` and padded so that
            W divides by (witness-axis size × wchunk).
        mesh: ("simplex", "witness") mesh.
        wchunk: witness chunk length.
        sort_axis: coordinate axis the witnesses are sorted along.

    Returns:
        (nb, B, R) distances, sharded along the simplex axis.
    """
    from ..ops.flood import flood_min_distances

    def body(verts_l, weights_l, centers_l, radii_l, wit_l):
        wit_axis_l = wit_l[:, sort_axis]
        imin, imax = batch_windows(
            centers_l[..., sort_axis], radii_l, wit_axis_l, wchunk
        )
        local = flood_min_distances(
            verts_l, weights_l, centers_l, radii_l, wit_l, imin, imax,
            wchunk=wchunk,
        )
        # combine partial minima across the witness shards over ICI
        return jax.lax.pmin(local, WITNESS_AXIS)

    fn = shard_map(
        body,
        mesh=mesh,
        # the scanned min-reduction mixes varying and invariant carries;
        # skip the varying-manual-axes check (outputs are pmin-combined)
        check_vma=False,
        in_specs=(
            P(SIMPLEX_AXIS, None, None, None),
            P(None, None),
            P(SIMPLEX_AXIS, None, None),
            P(SIMPLEX_AXIS, None),
            P(WITNESS_AXIS, None),
        ),
        out_specs=P(SIMPLEX_AXIS, None, None),
    )
    return fn(verts, weights, centers, radii, witnesses)


class MeshPallasFloodEngine:
    """The production Pallas kernel under a ("simplex", "witness") mesh.

    Scale-out version of ``ops.pallas_flood.PallasFloodEngine``: the cloud
    is Hilbert-sorted **globally**, then sharded in contiguous (therefore
    still Hilbert-tight) slices along the witness axis; simplex blocks are
    sharded along the simplex axis. The host builds one Morton/Hilbert
    work-list **per (simplex-shard, witness-shard) pair** — exactly the
    single-chip admission logic applied to each shard's chunk boxes — and
    a single ``shard_map`` runs the fused kernel on every device over its
    local pair segments. Per-shard partial minima (each exact for its
    witness slice) combine with one ``lax.pmin`` over ICI; min is
    associative, so the result is bit-identical to the single-chip kernel
    up to reduction order.

    Usage: ``flood_complex(points, lms, mesh=mesh)`` — selected
    automatically on TPU float32 (``use_pallas=False`` forces the dense
    mesh engine).

    Like the single-chip engine, the mesh path runs the static
    work-list in one pass (a two-phase bound refresh was measured
    +0.24 s slower on hardware and deleted, tpu_runs/sweep_r04.jsonl).
    """

    def __init__(self, points: jax.Array, wchunk: int, mesh: Mesh,
                 interpret=None):
        from ..ops import pallas_flood as pf

        if points.dtype != jnp.float32:
            raise TypeError(
                "the Pallas mesh engine supports float32 only; "
                "use use_pallas=False for float64"
            )
        if interpret is None:
            from ..utils.device import platform_of

            interpret = platform_of(points) != "tpu"
        self.interpret = bool(interpret)
        self.mesh = mesh
        del wchunk  # block geometry is fixed by the kernel
        self.wchunk = pf.WCHUNK
        n, dim = points.shape
        self.dim = dim
        bits = max(1, min(10, pf.MORTON_BITS_TOTAL // dim))
        self._bits = bits
        n_ws = mesh.shape[WITNESS_AXIS]
        # Per-shard chunk count bucketed to a power of two (the local
        # witness shape is a kernel compile key, exactly as single-chip).
        per_shard = -(-max(n, self.wchunk) // (self.wchunk * n_ws))
        n_chunks_l = 1 << max(0, per_shard - 1).bit_length()
        self.n_chunks_l = n_chunks_l
        total = n_ws * n_chunks_l * self.wchunk
        # Witness ordering: the same balanced k-d ordering the single-chip
        # engine ships (hardware-decided, tpu_runs/sweep_r0{4,5}.jsonl).
        # Cyclic pre-padding replaces far-fill chunks: duplicates are
        # idempotent under the min-fold and land inside tight leaves,
        # whereas far sentinels would blow up their leaf boxes.
        pts_padded = points
        if total != n:
            reps = jnp.tile(points, (-(-total // n), 1))[: total - n]
            pts_padded = jnp.concatenate([points, reps], axis=0)
        if pf.use_host_kd(total, pf.SUB):
            # host ordering: small clouds (zero device compile) and
            # non-power-of-two leaf counts (a non-pow2 witness mesh
            # axis), which the rolled device program's segment
            # arithmetic does not support — the host twin implements
            # the original unrolled recursion for any leaf count
            order = jnp.asarray(pf.kd_order_np(np.asarray(pts_padded),
                                               leaf=pf.SUB))
        else:
            order = pf.kd_order_device(pts_padded, leaf=pf.SUB)
        pts_sorted = pts_padded[order]
        chunks = pts_sorted.reshape(n_ws * n_chunks_l, self.wchunk, dim)
        self.chunk_lo = jnp.min(chunks, axis=1)
        self.chunk_hi = jnp.max(chunks, axis=1)
        # transposed (dim, W) storage sharded along the witness axis
        self.witnesses = jax.device_put(
            jnp.transpose(pts_sorted),
            jax.sharding.NamedSharding(mesh, P(None, WITNESS_AXIS)),
        )

    def order(self, centers: jax.Array) -> np.ndarray:
        from ..ops.pallas_flood import spatial_order_np

        return spatial_order_np(centers, self._bits)

    def min_distances(self, verts, weights, centers, radii, batch_size,
                      tight=False):
        del batch_size
        out, sperm, num_simplices, s_total, r2_total = self._run_kernel(
            verts, weights, centers, radii, tight
        )
        from ..ops.pallas_flood import _inf_masked

        out = out.reshape(s_total, r2_total)[:num_simplices]
        inv = np.argsort(sperm)
        # same empty-ball normalization as the single-chip engine: a tile
        # computed with every witness masked must report inf, not ~9e36
        return jnp.sqrt(_inf_masked(out[:, jnp.asarray(inv)]))

    def min_distances_facemax(
        self, verts, weights, centers, radii, batch_size, tight=False,
        face_tables=None,
    ):
        """Fused face-max epilogue on the combined squared minima (same
        contract as ``PallasFloodEngine.min_distances_facemax``)."""
        from ..ops.pallas_flood import _facemax_epilogue, _max_sqrt_epilogue

        del batch_size
        out, sperm, num_simplices, s_total, r2_total = self._run_kernel(
            verts, weights, centers, radii, tight
        )
        acc2 = out.reshape(s_total, r2_total)
        if face_tables is None:
            return _max_sqrt_epilogue(acc2)[:num_simplices]
        inv = np.argsort(sperm)
        tables = tuple(
            jnp.asarray(inv[np.asarray(t, dtype=np.int64)], dtype=jnp.int32)
            for t in face_tables
        )
        outs = _facemax_epilogue(acc2, tables)
        return tuple(o[:num_simplices] for o in outs)

    def _run_kernel(self, verts, weights, centers, radii, tight):
        from ..ops import pallas_flood as pf
        from ..ops.pallas_flood import (
            BS, PACK_ADMISSION, _flood_pairs_call, _pad_simplices, _prep,
            _prepare_sample_weights, _tile_geometry, _x32_mode,
            unpack_admission,
        )

        mesh = self.mesh
        n_ss = mesh.shape[SIMPLEX_AXIS]
        n_ws = mesh.shape[WITNESS_AXIS]
        num_simplices, k, dim = verts.shape
        r_count = weights.shape[0]
        # per-shard simplex-block count, bucketed to a power of two
        per_shard = -(-(-(-num_simplices // BS)) // n_ss)
        nsb_l = 1 << max(0, per_shard - 1).bit_length()
        s_total = n_ss * nsb_l * BS
        rt, nr, r2_total = _tile_geometry(r_count)

        verts, centers, radii = _pad_simplices(
            verts, centers, radii, s_total
        )
        weights_p, sperm = _prepare_sample_weights(weights, r2_total)
        verts_local = verts - centers[:, None, :]

        samples, tile_lo, tile_hi, ub2, adm_dev = _prep(
            verts_local, weights_p, centers, radii,
            self.chunk_lo, self.chunk_hi,
            bs=BS, nr=nr, rt=rt, tight=tight, wchunk=self.wchunk,
            pack=PACK_ADMISSION,
        )
        active, pairdist = unpack_admission(jax.device_get(adm_dev))

        # Balance witness-chunk load across the witness shards before
        # slicing (see balance_chunk_assignment): permute the active/
        # pairdist columns, the chunk boxes, and the witness storage with
        # one consistent chunk permutation. Identity when n_ws == 1 or
        # already balanced.
        # The permutation gathers are resolved by GSPMD as an all-gather
        # of the sharded operand (arbitrary cross-shard indices), so each
        # device transiently holds a full copy. That is fine at every
        # scale this machine tests, but witness sharding exists precisely
        # for clouds bigger than one chip's HBM — guard the optimization
        # by operand size and fall back to the contiguous (unbalanced)
        # assignment beyond it rather than OOM.
        gather_limit = 2 * 1024**3  # bytes of transient full copy
        witnesses = self.witnesses
        wit_bytes = int(np.prod(self.witnesses.shape)) * 4
        if n_ws > 1 and wit_bytes <= gather_limit:
            chunk_perm = balance_chunk_assignment(active.sum(axis=0), n_ws)
            if not np.array_equal(chunk_perm, np.arange(len(chunk_perm))):
                active = active[:, chunk_perm]
                pairdist = pairdist[:, chunk_perm]
                n_chunks_g = len(chunk_perm)
                witnesses = jax.device_put(
                    jnp.reshape(
                        jnp.reshape(
                            self.witnesses, (dim, n_chunks_g, self.wchunk)
                        )[:, jnp.asarray(chunk_perm)],
                        (dim, n_chunks_g * self.wchunk),
                    ),
                    jax.sharding.NamedSharding(mesh, P(None, WITNESS_AXIS)),
                )
                # chunk boxes only feed _prep's admission matrix, which is
                # already computed — no need to permute self.chunk_lo/hi

        # Balance simplex-BLOCK load across the simplex shards the same
        # way (block identity is as arbitrary as chunk identity): permute
        # the admission rows and every per-simplex kernel operand by
        # block, and inverse-permute the accumulator rows at the end.
        # Contiguous Hilbert-block ranges measure max/mean 1.34 at 8
        # shards (100k/300); LPT brings it to 1.04.
        inv_rows = None
        samples_bytes = int(np.prod(samples.shape)) * 4
        if n_ss > 1 and samples_bytes <= gather_limit:
            block_perm = balance_chunk_assignment(active.sum(axis=1), n_ss)
            if not np.array_equal(block_perm, np.arange(len(block_perm))):
                active = active[block_perm]
                pairdist = pairdist[block_perm]
                row_perm = (
                    block_perm[:, None].astype(np.int32) * BS
                    + np.arange(BS, dtype=np.int32)[None, :]
                ).reshape(-1)
                rp = jnp.asarray(row_perm)
                samples = samples[rp]
                tile_lo = tile_lo[rp]
                tile_hi = tile_hi[rp]
                ub2 = ub2[rp]
                centers = centers[rp]
                radii = radii[rp]
                inv_rows = jnp.asarray(np.argsort(row_perm).astype(np.int32))

        # per-(simplex shard, witness shard) work-lists in LOCAL indices,
        # nearest-first within each block (single-chip admission logic on
        # the shard's slice of the global active matrix)
        ncl = self.n_chunks_l
        lists = []
        max_pairs = 1
        for si in range(n_ss):
            row = []
            for wi in range(n_ws):
                a = active[si * nsb_l:(si + 1) * nsb_l,
                           wi * ncl:(wi + 1) * ncl]
                d = pairdist[si * nsb_l:(si + 1) * nsb_l,
                             wi * ncl:(wi + 1) * ncl]
                ps, pc = np.nonzero(a)
                o = np.lexsort((d[ps, pc], ps))
                ps, pc = ps[o].astype(np.int32), pc[o].astype(np.int32)
                # Padding pair for load balancing: SPMD forces every shard
                # to run the busiest shard's segment count, so pad the
                # shorter lists with a pair from a fully-inactive block —
                # the ball test fails for every simplex in the block, the
                # pair costs only its admission checks, and because it is
                # constant Pallas never re-DMAs its blocks (see
                # ops.pallas_flood.select_pad_pair for the reseed-race
                # argument). Falls back to repeating the last real pair
                # when every block has real pairs.
                padpair = pf.select_pad_pair(a, d)
                if padpair is None:
                    if len(ps):
                        padpair = (ps[-1], pc[-1])
                    else:
                        padpair = (np.int32(0), np.int32(0))
                row.append((ps, pc, padpair))
                max_pairs = max(max_pairs, len(ps))
            lists.append(row)

        seg_len = pf.PAIR_SEGMENT
        if self.interpret:
            seg_len = min(
                seg_len, max(256, 1 << max(0, max_pairs - 1).bit_length())
            )
        nseg = max(1, -(-max_pairs // seg_len))
        L = nseg * seg_len
        seg_s = np.zeros((n_ss, n_ws, L), dtype=np.int32)
        seg_c = np.zeros((n_ss, n_ws, L), dtype=np.int32)
        seg_f = np.zeros((n_ss, n_ws, L), dtype=np.int32)
        for si in range(n_ss):
            for wi in range(n_ws):
                ps, pc, padpair = lists[si][wi]
                if len(ps) != L:
                    pad = L - len(ps)
                    ps = np.concatenate([ps, np.full(pad, padpair[0])])
                    pc = np.concatenate([pc, np.full(pad, padpair[1])])
                seg_s[si, wi] = ps
                seg_c[si, wi] = pc
                # first-visit flags are per LAUNCH (segment)
                for g in range(nseg):
                    sl = ps[g * seg_len:(g + 1) * seg_len]
                    f = np.concatenate(
                        [[1], (sl[1:] != sl[:-1]).astype(np.int32)]
                    )
                    seg_f[si, wi, g * seg_len:(g + 1) * seg_len] = f

        ns = jax.sharding.NamedSharding
        sput = lambda arr: jax.device_put(
            np.asarray(arr),
            ns(mesh, P(SIMPLEX_AXIS, WITNESS_AXIS, None)),
        )
        seg_s_d, seg_c_d, seg_f_d = sput(seg_s), sput(seg_c), sput(seg_f)

        def shard_s(arr, extra):
            return jax.device_put(
                arr, ns(mesh, P(SIMPLEX_AXIS, *([None] * extra)))
            )

        samples_d = shard_s(samples, 3)
        centers_d = shard_s(centers, 1)
        radii_d = shard_s(radii[:, None], 1)
        tile_lo_d = shard_s(tile_lo, 2)
        tile_hi_d = shard_s(tile_hi, 2)
        ub2_d = shard_s(ub2, 2)
        # one partial-minimum copy per witness shard, combined once at the
        # end (min over the witness-sharded axis → one ICI reduction)
        acc = jax.device_put(
            jnp.full((n_ws, s_total, nr, rt), jnp.inf, dtype=jnp.float32),
            ns(mesh, P(WITNESS_AXIS, SIMPLEX_AXIS, None, None)),
        )

        interpret = self.interpret
        nsub = self.wchunk // pf.SUB

        # ONE kernel launch per jitted program, looped at the Python level
        # with the accumulator carried through (donated each call): the
        # compiled program size is constant in the cloud's pair count, so
        # clouds with different nseg reuse the same compiled segment body
        # instead of recompiling an nseg-times-unrolled trace.
        def body(ss, sc, sf, smp, wit, cen, rad, tlo, thi, u2, a):
            a = _flood_pairs_call(
                ss[0, 0], sc[0, 0], sf[0, 0], smp, wit, cen, rad,
                tlo, thi, u2, a[0],
                bs=BS, dim=dim, nsub=nsub, sub=pf.SUB,
                interpret=interpret,
            )
            return a[None]

        seg_fn = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                check_vma=False,
                in_specs=(
                    P(SIMPLEX_AXIS, WITNESS_AXIS, None),
                    P(SIMPLEX_AXIS, WITNESS_AXIS, None),
                    P(SIMPLEX_AXIS, WITNESS_AXIS, None),
                    P(SIMPLEX_AXIS, None, None, None),
                    P(None, WITNESS_AXIS),
                    P(SIMPLEX_AXIS, None),
                    P(SIMPLEX_AXIS, None),
                    P(SIMPLEX_AXIS, None, None),
                    P(SIMPLEX_AXIS, None, None),
                    P(SIMPLEX_AXIS, None, None),
                    P(WITNESS_AXIS, SIMPLEX_AXIS, None, None),
                ),
                out_specs=P(WITNESS_AXIS, SIMPLEX_AXIS, None, None),
            ),
            donate_argnums=(10,),
        )
        combine = jax.jit(
            lambda a: jnp.min(a, axis=0),
            out_shardings=ns(mesh, P(SIMPLEX_AXIS, None, None)),
        )
        with _x32_mode():
            for g in range(nseg):
                sl = slice(g * seg_len, (g + 1) * seg_len)
                acc = seg_fn(
                    seg_s_d[:, :, sl], seg_c_d[:, :, sl], seg_f_d[:, :, sl],
                    samples_d, witnesses, centers_d, radii_d,
                    tile_lo_d, tile_hi_d, ub2_d, acc,
                )
            # combine the per-witness-shard partial minima over ICI
            out = combine(acc)
            if inv_rows is not None:
                # undo the block load-balancing permutation so callers see
                # simplices in their original (Hilbert) order
                out = out[inv_rows]

        return out, sperm, num_simplices, s_total, r2_total


class MeshFloodEngine:
    """Engine plugging mesh-sharded reduction into ``flood_complex``.

    Construct via ``flood_complex(..., mesh=mesh)``; witnesses are sorted
    along the widest axis, padded to the shard grid, and laid out
    shard-by-shard along the witness axis; simplex batches are sharded
    along the simplex axis.
    """

    def __init__(self, points: jax.Array, wchunk: int, mesh: Mesh):
        self.mesh = mesh
        self.wchunk = wchunk
        self.dtype = points.dtype
        n_pts, dim = points.shape
        self.mrd = int(
            jnp.argmax(jnp.max(points, axis=0) - jnp.min(points, axis=0))
        )
        pts_sorted = points[jnp.argsort(points[:, self.mrd])]
        n_wshards = mesh.shape[WITNESS_AXIS]
        total = _round_up(max(n_pts, wchunk), wchunk * n_wshards)
        if total != n_pts:
            pad = jnp.full((total - n_pts, dim), WITNESS_PAD, dtype=points.dtype)
            pts_sorted = jnp.concatenate([pts_sorted, pad], axis=0)
        self.witnesses = jax.device_put(
            pts_sorted,
            jax.sharding.NamedSharding(mesh, P(WITNESS_AXIS, None)),
        )

    def order(self, centers: jax.Array) -> jax.Array:
        return jnp.argsort(centers[:, self.mrd])

    def min_distances(self, verts, weights, centers, radii, batch_size, tight=False):
        del tight  # pruning hint used by the Pallas engine only
        num_simplices, k, dim = verts.shape
        n_sshards = self.mesh.shape[SIMPLEX_AXIS]
        bsz = max(1, min(int(batch_size), num_simplices))
        r_count = weights.shape[0]
        elem = jnp.dtype(self.dtype).itemsize
        max_b = max(1, (256 << 20) // max(1, r_count * self.wchunk * elem))
        bsz = min(bsz, max_b)
        nb = _round_up(-(-num_simplices // bsz), n_sshards)
        total = nb * bsz

        def pad(arr):
            if arr.shape[0] == total:
                return arr
            reps = jnp.repeat(arr[-1:], total - arr.shape[0], axis=0)
            return jnp.concatenate([arr, reps], axis=0)

        ns = jax.sharding.NamedSharding
        verts_b = jax.device_put(
            pad(verts).reshape(nb, bsz, k, dim),
            ns(self.mesh, P(SIMPLEX_AXIS, None, None, None)),
        )
        centers_b = jax.device_put(
            pad(centers).reshape(nb, bsz, dim),
            ns(self.mesh, P(SIMPLEX_AXIS, None, None)),
        )
        radii_b = jax.device_put(
            pad(radii).reshape(nb, bsz), ns(self.mesh, P(SIMPLEX_AXIS, None))
        )
        weights = jax.device_put(weights, ns(self.mesh, P(None, None)))

        out = sharded_flood_min_distances(
            verts_b, weights, centers_b, radii_b, self.witnesses,
            mesh=self.mesh, wchunk=self.wchunk, sort_axis=self.mrd,
        )
        return out.reshape(total, r_count)[:num_simplices]
