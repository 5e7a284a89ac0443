"""Measure the flood kernel's REALIZED work volume on hardware.

The offline models bound the kernel's work from two sides: the static
work-volume replay (tools/worklist_volume.py) counts every tile the
static bounds admit, and the adaptive-floor replay
(tools/adaptive_floor.py) counts what perfectly-converged bounds would
admit. What neither can see is where the real kernel lands between them
— its branch-and-bound skip uses *running* bounds that tighten as chunks
are visited nearest-first, so the realized computed-tile count is a
hardware observable, not a model output.

This tool runs an instrumented clone of the production kernel
(ops/pallas_flood.py ``_flood_kernel``) that additionally accumulates,
per simplex row: visited pairs, admitted (simplex, sub-chunk)
computations, and computed sample tiles. The counters ride an extra
int32 block aliased across launches exactly like the distance
accumulator. Value parity with the production kernel is asserted on
every run, so the instrumented clone cannot drift from the shipped one.

Usage:
    python tools/kernel_stats.py --points 100000 --landmarks 300
    JAX_PLATFORMS=cpu python tools/kernel_stats.py --points 20000 \
        --landmarks 100 --out tpu_runs/kstats_20k.json
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flooder_tpu._platform import force_cpu_if_requested  # noqa: E402

force_cpu_if_requested()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from flooder_tpu.ops import pallas_flood as pf  # noqa: E402

# Counter columns in the (BS, 128) int32 stats block.
COL_PAIRS = 0  # grid steps that touched this block (per simplex row 0)
COL_SUBCHUNKS = 1  # admitted (simplex, sub-chunk) computations
COL_TILES = 2  # computed sample tiles (the unit the volume models price)


def _flood_kernel_stats(
    pair_s_ref, pair_c_ref, pair_first_ref,
    samples_ref, wit_ref, cent_ref, rad_ref,
    tile_lo_ref, tile_hi_ref, ub2_ref,
    acc_ref, stats_acc_ref,
    out_ref, stats_ref,
    tile_ok_ref,
    *, bs: int, dim: int, nsub: int, sub: int,
):
    """Instrumented clone of pf._flood_kernel: same VALUES (parity is
    asserted by run_with_stats), plus counter accumulation.

    NOTE: the clone deliberately snapshots the pre-940ad62 SCALAR
    admission loop — the production kernel since vectorizes admission
    over (BS, NSUB) — so its seg_times_s measure the old formulation's
    overhead, not production's. Counters and output values are
    formulation-independent; use tools/launch_overhead.py or bench.py
    for production timings."""
    p = pl.program_id(0)

    @pl.when(pair_first_ref[p] == 1)
    def _init():
        out_ref[:] = acc_ref[:]
        stats_ref[:] = stats_acc_ref[:]

    # Mosaic forbids scalar VMEM stores; counters update as masked
    # (1, 128) row ops on a lane-index iota.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats_ref[0:1, :] += jnp.where(lane == COL_PAIRS, 1, 0)

    nr = samples_ref.shape[1]
    rt = samples_ref.shape[3]
    y_all = jnp.transpose(wit_ref[:])

    s_bounds = jnp.max(jnp.max(out_ref[:], axis=2), axis=1)
    samp_lo = jnp.min(tile_lo_ref[:], axis=1)
    samp_hi = jnp.max(tile_hi_ref[:], axis=1)

    for isub in range(nsub):
        y = y_all[isub * sub : (isub + 1) * sub, :]
        box_lo = jnp.min(y, axis=0, keepdims=True)
        box_hi = jnp.max(y, axis=0, keepdims=True)
        for s in range(bs):
            c_s = cent_ref[s : s + 1, :]
            r2 = rad_ref[s : s + 1, :] * rad_ref[s : s + 1, :]
            near = jnp.clip(c_s, box_lo, box_hi) - c_s
            near_d2 = jnp.sum(near * near, axis=1, keepdims=True)
            blo = box_lo - c_s
            bhi = box_hi - c_s
            sgap = jnp.maximum(
                jnp.maximum(blo - samp_hi[s : s + 1, :],
                            samp_lo[s : s + 1, :] - bhi),
                0.0,
            )
            sgap2 = jnp.sum(sgap * sgap, axis=1, keepdims=True)
            admit = jnp.logical_and(
                near_d2[0, 0] <= r2[0, 0], sgap2[0, 0] <= s_bounds[s]
            )

            @pl.when(admit)
            def _compute(s=s, y=y, c_s=c_s, r2=r2, blo=blo, bhi=bhi):
                stats_ref[s : s + 1, :] += jnp.where(
                    lane == COL_SUBCHUNKS, 1, 0
                )
                tlo = tile_lo_ref[s]
                thi = tile_hi_ref[s]
                gap = jnp.maximum(jnp.maximum(blo - thi, tlo - bhi), 0.0)
                gap2 = jnp.sum(gap * gap, axis=1, keepdims=True)
                pm = jnp.max(out_ref[s], axis=1, keepdims=True)
                bound = jnp.minimum(pm, ub2_ref[s])
                tile_ok_ref[:] = (gap2 <= bound).astype(jnp.int32)

                @pl.when(jnp.max(tile_ok_ref[:]) == 1)
                def _tiles():
                    stats_ref[s : s + 1, :] += jnp.where(
                        lane == COL_TILES, jnp.sum(tile_ok_ref[:]), 0
                    )
                    yl = y - c_s
                    y2 = jnp.sum(yl * yl, axis=1, keepdims=True)
                    ymask = jnp.where(y2 <= r2, yl, jnp.float32(3e18))

                    def r_body(r, carry):
                        ok = tile_ok_ref[pl.ds(r, 1), :]

                        @pl.when(ok[0, 0] == 1)
                        def _tile(r=r):
                            prev = out_ref[s, pl.ds(r, 1), :]
                            x = samples_ref[s, r]
                            d2 = jnp.zeros((sub, rt), dtype=jnp.float32)
                            for i in range(dim):
                                diff = (
                                    ymask[:, i : i + 1] - x[i : i + 1, :]
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
    donate_argnums=(10, 11),
)
def _flood_pairs_call_stats(
    pair_s, pair_c, pair_first,
    samples, witnesses, centers, radii,
    tile_lo, tile_hi, ub2, acc, stats,
    *, bs: int, dim: int, nsub: int, sub: int, interpret: bool,
):
    npairs = pair_s.shape[0]
    nr = samples.shape[1]
    rt = samples.shape[3]
    wchunk = nsub * sub

    kernel = functools.partial(
        _flood_kernel_stats, bs=bs, dim=dim, nsub=nsub, sub=sub
    )
    blk = lambda shape, index_map: pl.BlockSpec(shape, index_map)  # noqa: E731
    out, stats_out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(npairs,),
            in_specs=[
                blk((bs, nr, dim, rt), lambda p, ps, pc, pf_: (ps[p], 0, 0, 0)),
                blk((dim, wchunk), lambda p, ps, pc, pf_: (0, pc[p])),
                blk((bs, dim), lambda p, ps, pc, pf_: (ps[p], 0)),
                blk((bs, 1), lambda p, ps, pc, pf_: (ps[p], 0)),
                blk((bs, nr, dim), lambda p, ps, pc, pf_: (ps[p], 0, 0)),
                blk((bs, nr, dim), lambda p, ps, pc, pf_: (ps[p], 0, 0)),
                blk((bs, nr, 1), lambda p, ps, pc, pf_: (ps[p], 0, 0)),
                blk((bs, nr, rt), lambda p, ps, pc, pf_: (ps[p], 0, 0)),
                blk((bs, 128), lambda p, ps, pc, pf_: (ps[p], 0)),
            ],
            out_specs=[
                blk((bs, nr, rt), lambda p, ps, pc, pf_: (ps[p], 0, 0)),
                blk((bs, 128), lambda p, ps, pc, pf_: (ps[p], 0)),
            ],
            scratch_shapes=[pltpu.VMEM((nr, 1), jnp.int32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(acc.shape, jnp.float32),
            jax.ShapeDtypeStruct(stats.shape, jnp.int32),
        ],
        input_output_aliases={10: 0, 11: 1},
        interpret=interpret,
    )(
        pair_s, pair_c, pair_first, samples, witnesses, centers, radii,
        tile_lo, tile_hi, ub2, acc, stats,
    )
    return out, stats_out


def run_with_stats(scene):
    """Walk the production work-list through the instrumented kernel and
    return (timings, counters, parity_ok)."""
    engine = scene.engine
    interpret = engine.interpret
    active, pairdist = jax.device_get((scene.active_d, scene.pairdist_d))
    pair_s_np, pair_c_np = np.nonzero(active)
    order = np.lexsort((pairdist[pair_s_np, pair_c_np], pair_s_np))
    pair_s_np = pair_s_np[order].astype(np.int32)
    pair_c_np = pair_c_np[order].astype(np.int32)
    npairs_real = len(pair_s_np)

    seg_len = pf.PAIR_SEGMENT
    if interpret:
        seg_len = max(256, 1 << max(0, npairs_real - 1).bit_length())
        seg_len = min(seg_len, pf.PAIR_SEGMENT)
    nseg = max(1, -(-npairs_real // seg_len))
    total = nseg * seg_len
    if total != npairs_real:
        pad = total - npairs_real
        pair_s_np = np.concatenate([pair_s_np, np.repeat(pair_s_np[-1:], pad)])
        pair_c_np = np.concatenate([pair_c_np, np.repeat(pair_c_np[-1:], pad)])

    radii2 = scene.radii_p[:, None]
    acc = jnp.full((scene.s_total, scene.nr, scene.rt), jnp.inf, jnp.float32)
    stats = jnp.zeros((scene.s_total, 128), jnp.int32)
    seg_times = []
    with pf._x32_mode():
        for g in range(nseg):
            sl = slice(g * seg_len, (g + 1) * seg_len)
            seg_s = pair_s_np[sl]
            seg_c = pair_c_np[sl]
            seg_first = np.concatenate(
                [[1], (seg_s[1:] != seg_s[:-1]).astype(np.int32)]
            ).astype(np.int32)
            t0 = time.perf_counter()
            acc, stats = _flood_pairs_call_stats(
                jnp.asarray(seg_s), jnp.asarray(seg_c),
                jnp.asarray(seg_first),
                scene.samples, engine.witnesses, scene.centers_p, radii2,
                scene.tile_lo, scene.tile_hi, scene.ub2, acc, stats,
                bs=pf.BS, dim=scene.dim, nsub=engine.wchunk // pf.SUB,
                sub=pf.SUB, interpret=interpret,
            )
            jax.block_until_ready((acc, stats))
            seg_times.append(time.perf_counter() - t0)

    # Parity vs the production kernel on the same scene.
    prod = engine.min_distances(
        scene.sim_verts, scene.weights, scene.centers, scene.radii,
        None, tight=True,
    )
    inv = np.argsort(scene.sperm)
    acc2 = np.asarray(acc).reshape(scene.s_total, scene.r2_total)
    mine = np.sqrt(
        np.where(acc2 >= pf._MASKED_D2, np.inf, acc2)
    )[: scene.num_simplices][:, inv]
    prod_np = np.asarray(prod)
    both_inf = np.isinf(mine) & np.isinf(prod_np)
    parity = bool(
        np.allclose(
            np.where(both_inf, 0.0, mine),
            np.where(both_inf, 0.0, prod_np),
            atol=1e-5, rtol=1e-5,
        )
    )

    st = np.asarray(stats)
    counters = {
        "visited_pairs": int(st[:: pf.BS, COL_PAIRS].sum()),
        "admitted_subchunks": int(st[:, COL_SUBCHUNKS].sum()),
        "computed_tiles": int(st[:, COL_TILES].sum()),
        "worklist_pairs": int(npairs_real),
    }
    return seg_times, counters, parity


def time_overhead(scene):
    """Time the PRODUCTION kernel on the real pair list with all radii
    zeroed, approximating the per-grid-step overhead (DMA + the per-pair
    fixed vector ops + the bs*nsub admission iterations) isolated from
    tile compute. Returns per-segment seconds.

    CAVEAT: admission tests near_d2 <= r2, and a ball center lying
    INSIDE a sub-chunk bbox gives near_d2 == 0, which fires even at
    radius 1e-12 — so some tile compute leaks into this measurement.
    Any number derived from it (e.g. the 11.4 us/step figure in
    pallas_flood.py) is an UPPER bound on pure overhead."""
    engine = scene.engine
    active, pairdist = jax.device_get((scene.active_d, scene.pairdist_d))
    pair_s_np, pair_c_np = np.nonzero(active)
    order = np.lexsort((pairdist[pair_s_np, pair_c_np], pair_s_np))
    pair_s_np = pair_s_np[order].astype(np.int32)
    pair_c_np = pair_c_np[order].astype(np.int32)
    npairs_real = len(pair_s_np)

    seg_len = pf.PAIR_SEGMENT
    if engine.interpret:
        seg_len = max(256, 1 << max(0, npairs_real - 1).bit_length())
        seg_len = min(seg_len, pf.PAIR_SEGMENT)
    nseg = max(1, -(-npairs_real // seg_len))
    total = nseg * seg_len
    if total != npairs_real:
        pad = total - npairs_real
        pair_s_np = np.concatenate([pair_s_np, np.repeat(pair_s_np[-1:], pad)])
        pair_c_np = np.concatenate([pair_c_np, np.repeat(pair_c_np[-1:], pad)])

    radii0 = jnp.zeros_like(scene.radii_p)[:, None] + 1e-12
    acc = jnp.full((scene.s_total, scene.nr, scene.rt), jnp.inf, jnp.float32)
    times = []
    with pf._x32_mode():
        for rep in range(2):
            seg_times = []
            for g in range(nseg):
                sl = slice(g * seg_len, (g + 1) * seg_len)
                seg_s = pair_s_np[sl]
                seg_c = pair_c_np[sl]
                seg_first = np.concatenate(
                    [[1], (seg_s[1:] != seg_s[:-1]).astype(np.int32)]
                ).astype(np.int32)
                t0 = time.perf_counter()
                acc = pf._flood_pairs_call(
                    jnp.asarray(seg_s), jnp.asarray(seg_c),
                    jnp.asarray(seg_first),
                    scene.samples, engine.witnesses, scene.centers_p,
                    radii0, scene.tile_lo, scene.tile_hi, scene.ub2, acc,
                    bs=pf.BS, dim=scene.dim, nsub=engine.wchunk // pf.SUB,
                    sub=pf.SUB, interpret=engine.interpret,
                )
                acc.block_until_ready()
                seg_times.append(time.perf_counter() - t0)
            times.append(seg_times)
    return times[-1]  # warm rep


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--landmarks", type=int, default=300)
    ap.add_argument("--cloud", default="cheese3d")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--overhead", action="store_true",
        help="also time the production kernel with zeroed radii "
        "(pure per-pair overhead)",
    )
    args = ap.parse_args()

    from pricing_common import build_scene

    scene = build_scene(
        args.points, args.landmarks, cloud=args.cloud, interpret=None
    )
    seg_times, counters, parity = run_with_stats(scene)
    overhead_times = time_overhead(scene) if args.overhead else None
    rec = {
        "points": args.points,
        "landmarks": args.landmarks,
        "cloud": args.cloud,
        "backend": jax.default_backend(),
        "num_simplices": int(scene.num_simplices),
        "nr": int(scene.nr),
        "rt": int(scene.rt),
        "seg_times_s": [round(t, 4) for t in seg_times],
        "overhead_seg_times_s": (
            [round(t, 4) for t in overhead_times]
            if overhead_times is not None
            else None
        ),
        "parity_vs_production": parity,
        **counters,
    }
    print(json.dumps(rec))
    if not parity:
        print("PARITY FAILURE vs production kernel", file=sys.stderr)
        sys.exit(1)
    if args.out:
        Path(args.out).write_text(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
