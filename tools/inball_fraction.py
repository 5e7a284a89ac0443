#!/usr/bin/env python3
"""Measure the in-ball witness fraction inside admitted kernel units.

For a sample of the kernel's admitted (simplex, sub-chunk) units at the
headline configuration, computes the fraction of the sub-chunk's
witnesses that actually lie inside the simplex's bounding ball. The tile
arithmetic processes ALL SUB witnesses (masked-out rows are moved far
away but still multiplied), so (1 − fraction) is the ceiling on what a
perfect witness-compaction scheme could save on top of the current skip
hierarchy.

Usage: JAX_PLATFORMS=cpu python tools/inball_fraction.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from flooder_tpu import generate_landmarks, generate_swiss_cheese_points
    from flooder_tpu.core import _grid_host, simplex_bounding_balls
    from flooder_tpu.ops import pallas_flood as pf
    from flooder_tpu.topology import DelaunayComplex

    n_points, n_landmarks = 1_000_000, 1000
    pts, _, _ = generate_swiss_cheese_points(n_points, k=6, seed=42)
    pts = jnp.asarray(pts, jnp.float32)
    lms = generate_landmarks(pts, n_landmarks, start_idx=0)

    engine = pf.PallasFloodEngine(pts, pf.WCHUNK, interpret=True)
    stree = DelaunayComplex(np.asarray(lms, np.float64)).create_simplex_tree()
    top = stree._verts[3]
    sim_verts = lms[jnp.asarray(top)]
    centers, radii = simplex_bounding_balls(sim_verts)
    order = engine.order(centers)
    centers = np.asarray(centers[order])
    radii = np.asarray(radii[order])

    wit = np.asarray(engine.witnesses).T  # (W, dim)
    nsub = engine.wchunk // pf.SUB
    n_chunks = wit.shape[0] // engine.wchunk
    subs = wit.reshape(n_chunks * nsub, pf.SUB, -1)
    sub_lo = subs.min(axis=1)
    sub_hi = subs.max(axis=1)

    rng = np.random.default_rng(0)
    # sample simplices; for each, find its admitted sub-chunks exactly as
    # the kernel's ball test does
    sample_s = rng.choice(len(centers), size=400, replace=False)
    fracs, unit_count = [], 0
    for s in sample_s:
        c = centers[s]
        r2 = radii[s] ** 2
        near = np.clip(c, sub_lo, sub_hi) - c
        ok = (near * near).sum(axis=1) <= r2
        for subi in np.nonzero(ok)[0]:
            d2 = ((subs[subi] - c) ** 2).sum(axis=1)
            fracs.append(float((d2 <= r2).mean()))
            unit_count += 1
    fracs = np.asarray(fracs)
    print(json.dumps({
        "sampled_simplices": len(sample_s),
        "admitted_units": unit_count,
        "inball_fraction_mean": round(float(fracs.mean()), 4),
        "inball_fraction_p50": round(float(np.percentile(fracs, 50)), 4),
        "inball_fraction_p90": round(float(np.percentile(fracs, 90)), 4),
        "compaction_ceiling_speedup": round(1.0 / max(fracs.mean(), 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
