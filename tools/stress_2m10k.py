#!/usr/bin/env python3
"""Full-size 2M x 10k stress validation (VERDICT round-2 item 4).

Builds the Flood complex + PH on a 2M-point 3-D swiss-cheese cloud with
10k landmarks and 6 voids, and checks that the six H2 death times match
the six void radii — at FULL size (the round-2 check was a 500k/5k spot
check). Backend-agnostic: on CPU it exercises the native C++ kernel; on
TPU the Pallas engine (and also reports wall-clock).

Usage: python tools/stress_2m10k.py [--points 2000000] [--landmarks 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=2_000_000)
    ap.add_argument("--landmarks", type=int, default=10_000)
    args = ap.parse_args()

    from flooder_tpu._platform import force_cpu_if_requested

    force_cpu_if_requested()
    import jax  # noqa: F401
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu import flood_complex, generate_swiss_cheese_points

    t0 = time.time()
    pts, centres, radii = generate_swiss_cheese_points(
        args.points, k=6, seed=42
    )
    pts = jnp.asarray(pts, jnp.float32)
    void_radii = np.sort(np.asarray(radii).reshape(-1))
    print(f"cloud ready {time.time()-t0:.1f}s; void radii {void_radii}",
          flush=True)

    t1 = time.time()
    stree = flood_complex(pts, args.landmarks, return_simplex_tree=True,
                          start_idx=0)
    build_s = time.time() - t1
    print(f"flood build {build_s:.1f}s, {stree.num_simplices()} simplices",
          flush=True)

    t2 = time.time()
    stree.compute_persistence()
    h2 = stree.persistence_intervals_in_dimension(2)
    ph_s = time.time() - t2

    # the six voids are the six most persistent H2 classes; deaths ≈ radii
    pers = h2[:, 1] - h2[:, 0]
    top = h2[np.argsort(pers)[-6:]]
    deaths = np.sort(top[:, 1])
    err = np.abs(deaths - void_radii)
    print(json.dumps({
        "points": args.points,
        "landmarks": args.landmarks,
        "backend": jax.default_backend(),
        "num_simplices": int(stree.num_simplices()),
        "build_seconds": round(build_s, 2),
        "persistence_seconds": round(ph_s, 2),
        "h2_bars": int(len(h2)),
        "void_radii": [round(float(r), 4) for r in void_radii],
        "top6_h2_deaths": [round(float(d), 4) for d in deaths],
        "max_abs_error": round(float(err.max()), 4),
        "pass": bool(err.max() < 0.05),
    }), flush=True)


if __name__ == "__main__":
    main()
