#!/usr/bin/env python3
"""Work-volume model for the fused flood kernel's skip hierarchy.

Computes, for the shipped Hilbert witness ordering, how much work the
kernel would actually execute at each level of its skip hierarchy on a
real cloud:

- admitted (simplex-block, witness-chunk) pairs (the work-list length),
- admitted (simplex, sub-chunk) units inside those pairs (ball test +
  static sample-box gap, the kernel's first in-register skip),
- admitted (tile, sub-chunk) units (static nearest-vertex bound only —
  the adaptive running-min bound cannot be modeled without executing the
  min-fold, so the numbers here are an UPPER bound on real work).

Scene setup and the admission replay live in tools/pricing_common.py
(shared with adaptive_floor and launch_overhead); it drives the
production engine's own prep code, so the pair lists are exactly the
ones the TPU kernel would walk. Was used to choose between witness orderings
(VERDICT round-2 item 3) before spending hardware time; the final call is
still a wall-clock sweep on the chip.

Usage:
    JAX_PLATFORMS=cpu python tools/worklist_volume.py --points 1000000 \
        --landmarks 1000
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
    # the kd ordering alternative was deleted after the 2026-08-18
    # hardware sweep (+0.04 s, under its 0.1 s adoption threshold); the
    # replay prices the shipped Hilbert order only

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
        "--wchunk", type=int, default=None,
        help="witness-chunk size override (default: the shipped 2048) — "
        "prices the frozen constant without reopening the engine knob",
    )
    ap.add_argument(
        "--cloud",
        choices=["cheese3d", "eight2d"],
        default="cheese3d",
        help="cheese3d: the headline 3-D swiss-cheese config; eight2d: "
        "the 2-D figure-eight of the reference's largest demonstrated "
        "run (ref examples/example_03_figure_eight_2d.py, 40M points)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu.ops import pallas_flood as pf
    from tools.pricing_common import build_scene, count_admission

    t0 = time.time()
    sc = build_scene(
        args.points, args.landmarks, cloud=args.cloud, seed=args.seed,
        wchunk=args.wchunk,
    )
    print(f"cloud+fps+prep {time.time()-t0:.1f}s", file=sys.stderr)

    if args.bound == "lm":
        # Re-derive ub2 with the landmark-seeded bound: per sample, the
        # min squared distance over ALL landmarks (not just the simplex's
        # own vertices). Exact offline via a KDTree over the landmarks;
        # the production kernel would approximate with K nearest
        # neighbouring landmarks gathered per simplex.
        from scipy.spatial import cKDTree

        samples_np = np.asarray(sc.samples)  # (S, NR, dim, RT) ball-local
        S, NR, dim, RT = samples_np.shape
        gl = samples_np.transpose(0, 1, 3, 2) + sc.cen[:, None, None, :]
        tree = cKDTree(np.asarray(sc.lms, np.float64))
        dmin, _ = tree.query(gl.reshape(-1, dim), k=1, workers=1)
        d2 = (dmin.astype(np.float32) ** 2).reshape(S, NR, RT)
        ub2_lm = d2.max(axis=2)[..., None]  # (S, NR, 1)
        # padding simplices keep their old (inf-free) bound semantics:
        # their radii are 0 so the ball test already excludes them
        sc.ub2 = jnp.asarray(np.minimum(np.asarray(sc.ub2), ub2_lm))
        sc.u2 = np.asarray(sc.ub2)[:, :, 0]
        ub2max_new = jnp.max(sc.ub2[:, :, 0], axis=1)
        active_d, _pairdist_d = pf._active_pairs_matrix(
            sc.centers_p, sc.radii_p,
            jnp.asarray(sc.samp_lo_g, jnp.float32),
            jnp.asarray(sc.samp_hi_g, jnp.float32),
            ub2max_new,
            sc.engine.chunk_lo, sc.engine.chunk_hi, sc.engine.wchunk, pf.BS,
        )
        sc.active = np.asarray(jax.device_get(active_d))
    print(f"prep {time.time()-t0:.1f}s", file=sys.stderr)

    pair_s, pair_c = np.nonzero(sc.active)
    npairs = len(pair_s)
    admitted_units, admitted_tiles = count_admission(
        sc, pair_s, pair_c, sc.u2
    )

    total_units = npairs * pf.BS * sc.nsub
    flops_per_tile = pf.SUB * sc.rt * (2 * sc.dim + 1)
    print(f"analysis {time.time()-t0:.1f}s", file=sys.stderr)
    import json

    print(json.dumps({
        "order": "hilbert",
        "bound": args.bound,
        "cloud": args.cloud,
        "dim": sc.dim,
        "points": args.points,
        "landmarks": args.landmarks,
        "wchunk": int(sc.engine.wchunk),
        "n_chunks": int(sc.n_chunks),
        "work_list_pairs": int(npairs),
        "pair_fraction": round(npairs / (sc.active.size), 4),
        "admitted_simplex_subchunk_units": int(admitted_units),
        "unit_fraction_of_pairs": round(admitted_units / total_units, 4),
        "admitted_tile_units_static": int(admitted_tiles),
        "tile_tflops_upper_bound": round(
            admitted_tiles * flops_per_tile / 1e12, 3
        ),
    }))


if __name__ == "__main__":
    main()
