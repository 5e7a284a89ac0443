#!/usr/bin/env python3
"""Measure the flood kernel's per-launch overhead on the current backend.

The two-phase decision prior from tools/adaptive_floor.py is a
break-even per-launch overhead; this measures the real constant: a
work-list segment whose pairs are all from a fully-inactive (zero-
radius) block costs only admission checks, so timing S back-to-back
such launches isolates dispatch + scalar-prefetch + grid overhead.

Scene setup lives in tools/pricing_common.py (shared with
worklist_volume and adaptive_floor).

Usage: python tools/launch_overhead.py [--segments 16]
(runs on whatever backend jax selects; pass through the wedge guard
with a bounded timeout when driving the real chip)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", type=int, default=16)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    # shared config-level guard (flooder_tpu/_platform.py); --cpu forces
    # regardless of the environment
    from flooder_tpu._platform import force_cpu_if_requested

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        force_cpu_if_requested()
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu.ops import pallas_flood as pf
    from tools.pricing_common import build_scene

    # interpret=None: let the engine pick for the real backend
    sc = build_scene(args.points, 300, interpret=None)
    engine = sc.engine
    pad = pf.select_pad_pair(sc.active)
    if pad is None:
        print("no fully-inactive block; raise --points", file=sys.stderr)
        sys.exit(1)

    seg_len = 2048  # the fixed phase-A segment length
    ps = np.full(seg_len, pad[0], np.int32)
    pc = np.full(seg_len, pad[1], np.int32)
    first = np.zeros(seg_len, np.int32)
    first[0] = 1
    acc = jnp.full((sc.s_total, sc.nr, sc.rt), jnp.inf, dtype=jnp.float32)
    interp = engine.interpret

    def launch(a):
        return pf._flood_pairs_call(
            jnp.asarray(ps), jnp.asarray(pc), jnp.asarray(first),
            sc.samples, engine.witnesses, sc.centers_p, sc.radii_p[:, None],
            sc.tile_lo, sc.tile_hi, sc.ub2, a,
            bs=pf.BS, dim=3, nsub=engine.wchunk // pf.SUB, sub=pf.SUB,
            interpret=interp,
        )

    acc = launch(acc)  # compile
    acc.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(args.segments):
        acc = launch(acc)
    acc.block_until_ready()
    dt = time.perf_counter() - t0
    import json

    print(json.dumps({
        "backend": jax.default_backend(),
        "segments": args.segments,
        "seg_len": seg_len,
        "per_launch_ms": round(dt / args.segments * 1e3, 3),
        "note": "all-inactive-pad segments: admission checks only; "
                "compare against adaptive_floor's "
                "break_even_launch_overhead_ms",
    }))


if __name__ == "__main__":
    main()
