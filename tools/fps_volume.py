#!/usr/bin/env python3
"""Work-volume model for the Pallas FPS kernel's chunk-skip sweep.

Replays, on the host, exactly the admission rule of
``flooder_tpu/ops/pallas_fps.py::_fps_kernel``: the cloud is
Hilbert-sorted into (dim, 8192) chunks with per-chunk bounding boxes;
each greedy sweep folds the newest landmark only into chunks whose
box-to-landmark lower bound is strictly below the chunk's running max
min-distance (``lb2 < cmax``). Everything else — per-chunk running
max/argmax kept valid across skipped sweeps, first-max tie-breaking,
start-point padding — matches the kernel, so the admitted-chunk counts
are exactly the DMA+VPU work the TPU kernel would execute.

Outputs one JSON line with:
- total admitted chunk-visits and the fraction of the naive L*nchunks,
- HBM bytes those visits move (the (8, 8192) point tile + the (1, 8192)
  min-distance row read+write per visit), and time projections at two
  bracketing HBM bandwidths (MODEL numbers — phase 2 of the hardware
  session replaces them with wall-clock),
- the per-sweep admitted-count decay (head + tail mean) showing how fast
  the sweep collapses from O(nchunks) to a local ball.

``--check`` additionally verifies the replayed selection against
brute-force greedy FPS (validates the skip invariant independently of
the interpret-mode kernel tests).

Usage:
    JAX_PLATFORMS=cpu python tools/fps_volume.py --points 1000000 \
        --landmarks 1000 [--cloud cheese3d|eight2d] [--check]

Replaces the guessed FPS row in docs/performance.md's wall-clock model;
reference equivalent is fpsample's Rust bucket FPS (ref core.py:291-343),
which is hardware-proven — this model is our pre-hardware stand-in.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 8192
DIM_PAD = 8  # the kernel streams (8, CHUNK) point tiles


def replay(pts_sorted, n_samples, start_sorted, progress=False):
    """Replay the kernel's greedy loop with chunk-skip admission.

    Returns (selected sorted-order indices, per-sweep admitted counts).
    """
    import numpy as np

    n = pts_sorted.shape[0]
    n_pad = ((max(n, CHUNK) + CHUNK - 1) // CHUNK) * CHUNK
    if n_pad != n:
        pad = np.repeat(pts_sorted[start_sorted][None, :], n_pad - n, axis=0)
        pts_sorted = np.concatenate([pts_sorted, pad], axis=0)
    nchunks = n_pad // CHUNK
    pts_c = pts_sorted.reshape(nchunks, CHUNK, -1)  # (C, 8192, dim)
    box_lo = pts_c.min(axis=1)  # (C, dim)
    box_hi = pts_c.max(axis=1)

    mind2 = np.full((nchunks, CHUNK), np.inf, dtype=np.float32)
    cmax = np.full(nchunks, np.inf, dtype=np.float32)
    cbest = np.zeros(nchunks, dtype=np.int64)
    out = np.empty(n_samples, dtype=np.int64)
    out[0] = start_sorted
    lm = pts_sorted[start_sorted]
    admitted = []
    t0 = time.time()
    for l in range(1, n_samples):
        gap = np.maximum(np.maximum(box_lo - lm, lm - box_hi), 0.0)
        lb2 = np.einsum("cd,cd->c", gap, gap).astype(np.float32)
        adm = np.nonzero(lb2 < cmax)[0]
        admitted.append(len(adm))
        diff = pts_c[adm] - lm  # (a, 8192, dim)
        d2 = np.einsum("acd,acd->ac", diff, diff).astype(np.float32)
        rows = np.minimum(mind2[adm], d2)
        mind2[adm] = rows
        cmax[adm] = rows.max(axis=1)
        cbest[adm] = adm * CHUNK + rows.argmax(axis=1)
        cstar = int(np.argmax(cmax))
        best = int(cbest[cstar])
        out[l] = best
        lm = pts_sorted[best]
        if progress and l % 200 == 0:
            print(
                f"  sweep {l}/{n_samples} adm={len(adm)}/{nchunks} "
                f"{time.time()-t0:.1f}s",
                file=sys.stderr,
            )
    return out, admitted, nchunks


def brute_greedy(pts, n_samples, start):
    import numpy as np

    mind2 = np.full(pts.shape[0], np.inf, dtype=np.float32)
    out = np.empty(n_samples, dtype=np.int64)
    out[0] = start
    lm = pts[start]
    for l in range(1, n_samples):
        d2 = np.einsum("nd,nd->n", pts - lm, pts - lm).astype(np.float32)
        mind2 = np.minimum(mind2, d2)
        out[l] = int(np.argmax(mind2))
        lm = pts[out[l]]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--landmarks", type=int, default=1000)
    ap.add_argument(
        "--cloud", choices=["cheese3d", "eight2d"], default="cheese3d"
    )
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from flooder_tpu import (
        generate_figure_eight_points_2d,
        generate_swiss_cheese_points,
    )
    from flooder_tpu.ops.pallas_flood import hilbert_codes_np

    t0 = time.time()
    if args.cloud == "eight2d":
        # reference example_03's exact cloud (noise_std=0.02 gaussian)
        pts = generate_figure_eight_points_2d(
            args.points, noise_std=0.02, noise_kind="gaussian",
            seed=args.seed,
        )
    else:
        pts, _, _ = generate_swiss_cheese_points(
            args.points, k=6, seed=args.seed
        )
    pts = np.asarray(pts, np.float32)
    n, dim = pts.shape
    # same curve parameters as _fps_prepare (pallas_fps.py:266-268).
    # Quantize in float32, NOT float64: the kernel's device-side
    # hilbert_codes runs on f32 points, and a point whose quantized cell
    # flips under f64 rounding would land in a different chunk, drifting
    # the admitted-visit counts this tool claims are exact. numpy's weak
    # scalar promotion keeps (pts - lo) / extent * (2**bits - 1e-3) in
    # f32, matching the device arithmetic op-for-op.
    bits = max(1, min(10, 24 // dim))
    codes = hilbert_codes_np(pts, bits)
    order = np.argsort(codes, kind="stable")
    pts_sorted = pts[order]
    start_sorted = int(np.nonzero(order == 0)[0][0])
    print(f"cloud+sort {time.time()-t0:.1f}s", file=sys.stderr)

    t1 = time.time()
    sel, admitted, nchunks = replay(
        pts_sorted, args.landmarks, start_sorted, progress=True
    )
    replay_s = time.time() - t1

    if args.check:
        ref = brute_greedy(pts_sorted, args.landmarks, start_sorted)
        # compare the selected SETS via their min-distance profiles: ties
        # may break differently, but greedy distance sequences must match
        def profile(idx):
            d2 = np.full(n, np.inf, dtype=np.float32)
            seq = []
            for i in idx:
                seq.append(float(d2[i]) if np.isfinite(d2[i]) else -1.0)
                v = pts_sorted[i]
                d2 = np.minimum(
                    d2,
                    np.einsum(
                        "nd,nd->n", pts_sorted - v, pts_sorted - v
                    ).astype(np.float32),
                )
            return np.array(seq[1:])

        pa, pb = profile(sel), profile(ref)
        ok = np.allclose(pa, pb, rtol=1e-5, atol=1e-7)
        print(f"parity check: {'OK' if ok else 'MISMATCH'}", file=sys.stderr)
        if not ok:
            bad = np.nonzero(~np.isclose(pa, pb, rtol=1e-5, atol=1e-7))[0]
            print(f"  first mismatch at sweep {bad[0]+1}", file=sys.stderr)
            sys.exit(1)

    visits = int(np.sum(admitted))
    sweeps = len(admitted)
    naive = sweeps * nchunks
    # per admitted visit the kernel moves the (8, 8192) f32 point tile in
    # plus the (1, 8192) f32 min-distance row in and out
    bytes_visit = (DIM_PAD * CHUNK + 2 * CHUNK) * 4
    hbm_bytes = visits * bytes_visit
    tail = admitted[min(50, sweeps - 1):]
    result = {
        "cloud": args.cloud,
        "points": n,
        "landmarks": args.landmarks,
        "chunk": CHUNK,
        "n_chunks": nchunks,
        "sweeps": sweeps,
        "admitted_chunk_visits": visits,
        "visit_fraction_of_naive": round(visits / naive, 4),
        "admitted_head": admitted[:10],
        "admitted_tail_mean": round(float(np.mean(tail)), 1),
        "hbm_gbytes": round(hbm_bytes / 1e9, 3),
        "model_seconds_at_800GBps": round(hbm_bytes / 800e9, 4),
        "model_seconds_at_1200GBps": round(hbm_bytes / 1200e9, 4),
        "replay_seconds_cpu": round(replay_s, 1),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
