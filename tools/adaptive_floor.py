#!/usr/bin/env python3
"""Floor of the fused kernel's tile work under PERFECT adaptive bounds.

The work-volume model (worklist_volume.py) counts tiles admitted by the
STATIC bound only — an upper bound on kernel work. This tool computes the
floor: using the exact per-sample minima (from the native CPU engine), it
replays tile admission with the converged adaptive bound
min(true-tile-max, static-ub) that the kernel's running-min bound
approaches from above. Real kernel work lies between floor and ceiling;
the gap is what better visit ordering / bound refresh could still win.

Usage: JAX_PLATFORMS=cpu python tools/adaptive_floor.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu import generate_landmarks, generate_swiss_cheese_points
    from flooder_tpu.core import _grid_host, simplex_bounding_balls
    from flooder_tpu.ops import pallas_flood as pf
    from flooder_tpu.ops.flood import DenseFloodEngine
    from flooder_tpu.topology import DelaunayComplex

    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--landmarks", type=int, default=1000)
    args = ap.parse_args()
    n_points, n_landmarks = args.points, args.landmarks
    pts, _, _ = generate_swiss_cheese_points(n_points, k=6, seed=42)
    pts = jnp.asarray(pts, jnp.float32)
    lms = generate_landmarks(pts, n_landmarks, start_idx=0)

    engine = pf.PallasFloodEngine(pts, pf.WCHUNK, interpret=True)
    stree = DelaunayComplex(np.asarray(lms, np.float64)).create_simplex_tree()
    top = stree._verts[3]
    sim_verts = lms[jnp.asarray(top)]
    centers, radii = simplex_bounding_balls(sim_verts)
    order = engine.order(centers)
    sim_verts = sim_verts[order]
    centers = centers[order]
    radii = radii[order]

    grid_np, _, _ = _grid_host(30, 3)
    weights = jnp.asarray(grid_np, jnp.float32)
    num_simplices = sim_verts.shape[0]
    print(f"simplices {num_simplices}", file=sys.stderr)

    # exact minima via the native CPU engine (same algorithm, no tiles)
    dense = DenseFloodEngine(pts, 2048)
    dists = np.asarray(
        dense.min_distances(sim_verts, weights, centers, radii, 4096)
    )  # (S, R) in original sample order
    print("exact distances done", file=sys.stderr)

    # tile layout identical to the production engine
    n_sblocks = 1 << max(0, (-(-num_simplices // pf.BS) - 1)).bit_length()
    s_total = n_sblocks * pf.BS
    rt, nr, r2_total = pf._tile_geometry(weights.shape[0])
    verts_p, centers_p, radii_p = pf._pad_simplices(
        sim_verts, centers, radii, s_total
    )
    weights_p, sperm = pf._prepare_sample_weights(weights, r2_total)
    verts_local = verts_p - centers_p[:, None, :]
    samples, tile_lo, tile_hi, ub2, active_d, pairdist_d = pf._prep(
        verts_local, weights_p, centers_p, radii_p,
        engine.chunk_lo, engine.chunk_hi,
        bs=pf.BS, nr=nr, rt=rt, tight=True, wchunk=engine.wchunk,
    )
    active = np.asarray(jax.device_get(active_d))

    d2_perm = (dists[:, sperm].astype(np.float64)) ** 2  # (S, R) permuted
    pad_cols = r2_total - d2_perm.shape[1]
    if pad_cols:
        d2_perm = np.concatenate(
            [d2_perm, np.repeat(d2_perm[:, -1:], pad_cols, axis=1)], axis=1
        )
    tile_true_max = d2_perm.reshape(num_simplices, nr, rt).max(axis=2)
    # padded simplices: zero bound → admit nothing
    ttm = np.zeros((s_total, nr))
    ttm[:num_simplices] = tile_true_max
    u2 = np.asarray(ub2)[:, :, 0]
    bound = np.minimum(ttm, u2)  # (S, NR): converged adaptive bound

    wit = np.asarray(engine.witnesses).T
    nsub = engine.wchunk // pf.SUB
    n_chunks = wit.shape[0] // engine.wchunk
    subs = wit.reshape(n_chunks * nsub, pf.SUB, -1)
    sub_lo = subs.min(axis=1)
    sub_hi = subs.max(axis=1)

    cen = np.asarray(centers_p)
    rad = np.asarray(radii_p)
    t_lo = np.asarray(tile_lo)
    t_hi = np.asarray(tile_hi)

    pair_s, pair_c = np.nonzero(active)
    floor_tiles = 0
    B = 2048
    for beg in range(0, len(pair_s), B):
        ps = pair_s[beg:beg + B]
        pc = pair_c[beg:beg + B]
        sidx = (ps[:, None] * pf.BS + np.arange(pf.BS)[None, :]).reshape(-1)
        subi = (pc[:, None] * nsub + np.arange(nsub)[None, :]).reshape(-1)
        c_b = cen[sidx].reshape(len(ps), pf.BS, 1, -1)
        r_b = rad[sidx].reshape(len(ps), pf.BS, 1)
        bl = sub_lo[subi].reshape(len(ps), 1, nsub, -1)
        bh = sub_hi[subi].reshape(len(ps), 1, nsub, -1)
        near = np.clip(c_b, bl, bh) - c_b
        ball_ok = np.sum(near * near, axis=-1) <= r_b * r_b
        ui, uj, uk = np.nonzero(ball_ok)
        if not len(ui):
            continue
        sidx2 = ps[ui] * pf.BS + uj
        subi2 = pc[ui] * nsub + uk
        blo = sub_lo[subi2][:, None, :] - cen[sidx2][:, None, :]
        bhi = sub_hi[subi2][:, None, :] - cen[sidx2][:, None, :]
        tgap = np.maximum(np.maximum(blo - t_hi[sidx2], t_lo[sidx2] - bhi), 0.0)
        tgap2 = np.sum(tgap * tgap, axis=-1)  # (U, NR)
        floor_tiles += int((tgap2 <= bound[sidx2]).sum())

    # pair-level: how many work-list pairs survive when the per-simplex
    # static bound is replaced by the converged bound? (a two-phase
    # bound-refresh pass would skip the dropped pairs' launches entirely)
    bound_max = bound.max(axis=1)  # (S,) converged per-simplex bound
    samp_lo_g = np.asarray(jnp.min(tile_lo, axis=1)) + cen
    samp_hi_g = np.asarray(jnp.max(tile_hi, axis=1)) + cen
    chunk_lo = np.asarray(engine.chunk_lo)
    chunk_hi = np.asarray(engine.chunk_hi)
    c3 = cen.reshape(n_sblocks, pf.BS, 1, 3)
    r3 = rad.reshape(n_sblocks, pf.BS, 1)
    nearest = np.clip(c3, chunk_lo[None, None], chunk_hi[None, None])
    hit = (np.sum((c3 - nearest) ** 2, axis=-1) <= r3 * r3) & (r3 > 0)
    gapc = np.maximum(
        np.maximum(chunk_lo[None, None] - samp_hi_g.reshape(n_sblocks, pf.BS, 1, 3),
                   samp_lo_g.reshape(n_sblocks, pf.BS, 1, 3) - chunk_hi[None, None]),
        0.0,
    )
    gapc2 = np.sum(gapc * gapc, axis=-1)
    hit &= gapc2 <= bound_max.reshape(n_sblocks, pf.BS, 1)
    pairs_converged = int(np.any(hit, axis=1).sum())

    flops_per_tile = pf.SUB * rt * (2 * 3 + 1)
    print(json.dumps({
        "points": n_points,
        "landmarks": n_landmarks,
        "floor_tile_units": int(floor_tiles),
        "floor_tflops": round(floor_tiles * flops_per_tile / 1e12, 3),
        "pairs_static": int(len(pair_s)),
        "pairs_converged_bound": pairs_converged,
        "note": "ceiling (static-only) in wv_1m_hilbert.json; real kernel "
                "work lies between floor and ceiling",
    }))


if __name__ == "__main__":
    main()
