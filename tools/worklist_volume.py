#!/usr/bin/env python3
"""Work-volume model for the fused flood kernel's skip hierarchy.

Computes, for a given witness ordering (hilbert / kd), how much work the
kernel would actually execute at each level of its skip hierarchy on a
real cloud:

- admitted (simplex-block, witness-chunk) pairs (the work-list length),
- admitted (simplex, sub-chunk) units inside those pairs (ball test +
  static sample-box gap, the kernel's first in-register skip),
- admitted (tile, sub-chunk) units (static nearest-vertex bound only —
  the adaptive running-min bound cannot be modeled without executing the
  min-fold, so the numbers here are an UPPER bound on real work).

This runs entirely on the CPU backend with the production engine's own
prep code (`_prep`, same constants), so the pair lists are exactly the
ones the TPU kernel would walk. Used to choose between witness orderings
(VERDICT round-2 item 3) before spending hardware time; the final call is
still a wall-clock sweep on the chip.

Usage:
    JAX_PLATFORMS=cpu python tools/worklist_volume.py --points 1000000 \
        --landmarks 1000 --order hilbert
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--landmarks", type=int, default=1000)
    ap.add_argument("--order", choices=["hilbert", "kd"], default="hilbert")
    ap.add_argument(
        "--bound",
        choices=["vertex", "lm"],
        default="vertex",
        help="static upper bound: nearest own vertex (production) or "
        "nearest landmark over ALL landmarks (candidate: landmarks are "
        "witnesses in tight mode, so any landmark's distance bounds the "
        "sample's min witness distance — strictly tighter than vertex)",
    )
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--cloud",
        choices=["cheese3d", "eight2d"],
        default="cheese3d",
        help="cheese3d: the headline 3-D swiss-cheese config; eight2d: "
        "the 2-D figure-eight of the reference's largest demonstrated "
        "run (ref examples/example_03_figure_eight_2d.py, 40M points)",
    )
    args = ap.parse_args()

    if args.order == "kd":
        os.environ["FLOODER_WITNESS_ORDER"] = "kd"
    else:
        os.environ.pop("FLOODER_WITNESS_ORDER", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu import (
        generate_figure_eight_points_2d,
        generate_landmarks,
        generate_swiss_cheese_points,
    )
    from flooder_tpu.core import _grid_host, simplex_bounding_balls
    from flooder_tpu.ops import pallas_flood as pf
    from flooder_tpu.topology import DelaunayComplex

    t0 = time.time()
    if args.cloud == "eight2d":
        # reference example_03's exact cloud parameters
        # (noise_std=0.02 gaussian, ref example_03_figure_eight_2d.py:48)
        pts = generate_figure_eight_points_2d(
            args.points, noise_std=0.02, noise_kind="gaussian",
            seed=args.seed,
        )
    else:
        pts, _, _ = generate_swiss_cheese_points(
            args.points, k=6, seed=args.seed
        )
    pts = jnp.asarray(pts, jnp.float32)
    dim = pts.shape[1]
    lms = generate_landmarks(pts, args.landmarks, start_idx=0)
    print(f"cloud+fps {time.time()-t0:.1f}s", file=sys.stderr)

    engine = pf.PallasFloodEngine(pts, pf.WCHUNK, interpret=True)
    stree = DelaunayComplex(np.asarray(lms, np.float64)).create_simplex_tree()
    top = (
        stree._verts[dim] if len(stree._verts) > dim else stree._verts[-1]
    )
    sim_verts = lms[jnp.asarray(top)]
    centers, radii = simplex_bounding_balls(sim_verts)
    order = engine.order(centers)
    sim_verts = sim_verts[order]
    centers = centers[order]
    radii = radii[order]

    grid_np, _, _ = _grid_host(30, dim)
    weights = jnp.asarray(grid_np, jnp.float32)
    num_simplices = sim_verts.shape[0]

    # identical prep path to the production engine
    n_sblocks = 1 << max(0, (-(-num_simplices // pf.BS) - 1)).bit_length()
    s_total = n_sblocks * pf.BS
    rt, nr, r2_total = pf._tile_geometry(weights.shape[0])
    verts, centers_p, radii_p = pf._pad_simplices(
        sim_verts, centers, radii, s_total
    )
    weights_p, _ = pf._prepare_sample_weights(weights, r2_total)
    verts_local = verts - centers_p[:, None, :]
    samples, tile_lo, tile_hi, ub2, active_d, pairdist_d = pf._prep(
        verts_local, weights_p, centers_p, radii_p,
        engine.chunk_lo, engine.chunk_hi,
        bs=pf.BS, nr=nr, rt=rt, tight=True, wchunk=engine.wchunk,
    )
    if args.bound == "lm":
        # Re-derive ub2 with the landmark-seeded bound: per sample, the
        # min squared distance over ALL landmarks (not just the simplex's
        # own vertices). Exact offline via a KDTree over the landmarks;
        # the production kernel would approximate with K nearest
        # neighbouring landmarks gathered per simplex.
        from scipy.spatial import cKDTree

        samples_np = np.asarray(samples)  # (S, NR, dim, RT) ball-local
        S, NR, dim, RT = samples_np.shape
        gl = samples_np.transpose(0, 1, 3, 2) + np.asarray(centers_p)[
            :, None, None, :
        ]  # (S, NR, RT, dim) global
        tree = cKDTree(np.asarray(lms, np.float64))
        dmin, _ = tree.query(gl.reshape(-1, dim), k=1, workers=1)
        d2 = (dmin.astype(np.float32) ** 2).reshape(S, NR, RT)
        ub2_lm = d2.max(axis=2)[..., None]  # (S, NR, 1)
        # padding simplices keep their old (inf-free) bound semantics:
        # their radii are 0 so the ball test already excludes them
        ub2 = jnp.asarray(np.minimum(np.asarray(ub2), ub2_lm))
        ub2max_new = jnp.max(ub2[:, :, 0], axis=1)
        samp_lo_g = jnp.min(tile_lo, axis=1) + centers_p
        samp_hi_g = jnp.max(tile_hi, axis=1) + centers_p
        active_d, pairdist_d = pf._active_pairs_matrix(
            centers_p, radii_p, samp_lo_g, samp_hi_g, ub2max_new,
            engine.chunk_lo, engine.chunk_hi, engine.wchunk, pf.BS,
        )
    active, pairdist = jax.device_get((active_d, pairdist_d))
    print(f"prep {time.time()-t0:.1f}s", file=sys.stderr)

    n_chunks = active.shape[1]
    pair_s, pair_c = np.nonzero(active)
    npairs = len(pair_s)

    # sub-chunk boxes from the engine's sorted witness layout
    wit = np.asarray(engine.witnesses).T  # (W, dim)
    nsub = engine.wchunk // pf.SUB
    subs = wit.reshape(n_chunks * nsub, pf.SUB, -1)
    sub_lo = subs.min(axis=1)  # (n_chunks*nsub, dim)
    sub_hi = subs.max(axis=1)

    cen = np.asarray(centers_p)
    rad = np.asarray(radii_p)
    slo = np.asarray(jnp.min(tile_lo, axis=1)) + cen  # (S, dim) global
    shi = np.asarray(jnp.max(tile_hi, axis=1)) + cen
    t_lo = np.asarray(tile_lo)  # (S, NR, dim) ball-local
    t_hi = np.asarray(tile_hi)
    u2 = np.asarray(ub2)[:, :, 0]  # (S, NR)

    # Evaluate the kernel's per-(simplex, sub-chunk) admission and the
    # static part of the per-tile admission for every work-list pair, in
    # batches over pairs.
    admitted_units = 0  # (simplex, sub-chunk) passes of the ball test
    admitted_tiles = 0  # (tile, sub-chunk) units by the static bound
    B = 2048
    for beg in range(0, npairs, B):
        ps = pair_s[beg:beg + B]
        pc = pair_c[beg:beg + B]
        sidx = (ps[:, None] * pf.BS + np.arange(pf.BS)[None, :]).reshape(-1)
        subi = (pc[:, None] * nsub + np.arange(nsub)[None, :]).reshape(-1)
        c_b = cen[sidx].reshape(len(ps), pf.BS, 1, -1)
        r_b = rad[sidx].reshape(len(ps), pf.BS, 1)
        bl = sub_lo[subi].reshape(len(ps), 1, nsub, -1)
        bh = sub_hi[subi].reshape(len(ps), 1, nsub, -1)
        near = np.clip(c_b, bl, bh) - c_b
        near_d2 = np.sum(near * near, axis=-1)  # (B, BS, nsub)
        ball_ok = near_d2 <= r_b * r_b
        # static sample-box gap vs nearest-vertex bound
        s_lo = slo[sidx].reshape(len(ps), pf.BS, 1, -1)
        s_hi = shi[sidx].reshape(len(ps), pf.BS, 1, -1)
        gap = np.maximum(np.maximum(bl - s_hi, s_lo - bh), 0.0)
        gap2 = np.sum(gap * gap, axis=-1)
        ubmax = u2[sidx].max(axis=-1).reshape(len(ps), pf.BS, 1)
        unit_ok = ball_ok & (gap2 <= ubmax)
        admitted_units += int(unit_ok.sum())

        # tile-level static admission inside admitted units
        ui, uj, uk = np.nonzero(unit_ok)
        if len(ui):
            sidx2 = ps[ui] * pf.BS + uj
            subi2 = pc[ui] * nsub + uk
            blo = sub_lo[subi2][:, None, :] - cen[sidx2][:, None, :]
            bhi = sub_hi[subi2][:, None, :] - cen[sidx2][:, None, :]
            tgap = np.maximum(
                np.maximum(blo - t_hi[sidx2], t_lo[sidx2] - bhi), 0.0
            )
            tgap2 = np.sum(tgap * tgap, axis=-1)  # (U, NR)
            admitted_tiles += int((tgap2 <= u2[sidx2]).sum())

    total_units = npairs * pf.BS * nsub
    flops_per_tile = pf.SUB * rt * (2 * dim + 1)
    print(f"analysis {time.time()-t0:.1f}s", file=sys.stderr)
    import json

    print(json.dumps({
        "order": args.order,
        "bound": args.bound,
        "cloud": args.cloud,
        "dim": dim,
        "points": args.points,
        "landmarks": args.landmarks,
        "n_chunks": int(n_chunks),
        "work_list_pairs": int(npairs),
        "pair_fraction": round(npairs / (active.size), 4),
        "admitted_simplex_subchunk_units": int(admitted_units),
        "unit_fraction_of_pairs": round(admitted_units / total_units, 4),
        "admitted_tile_units_static": int(admitted_tiles),
        "tile_tflops_upper_bound": round(
            admitted_tiles * flops_per_tile / 1e12, 3
        ),
    }))


if __name__ == "__main__":
    main()
