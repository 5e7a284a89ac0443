#!/usr/bin/env python3
"""Measure the axon tunnel's D2H latency/bandwidth profile.

The headline stage attribution (docs/performance.md "Where the time
goes") shows 0.24 s in prep:fused-dispatch, annotated "dominated by
tunnel round-trip latency". That stage executes one XLA program (~10 ms
of compute by the work-volume model) and one `jax.device_get` of the
(n_blocks, n_chunks) bool admission matrix + float32 pair-distance
matrix (0.5 MB + 2 MB at the 1M x 1k configuration). This probe
separates per-transfer latency from bandwidth so we know whether
shrinking/packing that transfer can buy anything:

  - if latency-dominated: packing 2.5 MB -> 1 MB saves ~nothing; fusing
    the two fetches into one saves one RTT at most.
  - if bandwidth-dominated: a packed uint16 fetch (1 MB) or a
    device-compacted pair list (~0.26 MB) is worth most of the stage.

Prints one JSON line per (size, rep).
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    print(f"# backend={backend}", file=sys.stderr, flush=True)

    # One computed array per size so the fetch is from a real buffer the
    # device produced (matching the prep stage), not a round-tripped host
    # literal.
    sizes = [
        ("4B", 1),
        ("4KB", 1024),
        ("64KB", 16 * 1024),
        ("256KB", 64 * 1024),
        ("1MB", 256 * 1024),
        ("2.5MB", 640 * 1024),
        ("10MB", 2560 * 1024),
    ]

    @functools.partial(jax.jit, static_argnums=0)
    def make(n):
        return jnp.ones((n,), jnp.float32) * 2.0

    # warmup: compile + first-sync stall absorbed here
    w = make(1024)
    _ = np.asarray(w)
    rows = []
    for label, n in sizes:
        arr = make(n)
        arr.block_until_ready()
        for rep in range(4):
            t0 = time.perf_counter()
            host = jax.device_get(arr)
            dt = time.perf_counter() - t0
            assert host.shape == (n,)
            row = {
                "label": label,
                "bytes": 4 * n,
                "rep": rep,
                "d2h_s": round(dt, 5),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    # paired fetch: two arrays in one device_get (the prep stage's exact
    # pattern) vs two sequential fetches — prices the per-call RTT.
    a = make(128 * 1024)   # 0.5 MB (the bool matrix, as f32 proxy)
    b = make(512 * 1024)   # 2 MB (the f32 pairdist matrix)
    a.block_until_ready()
    b.block_until_ready()
    for rep in range(4):
        t0 = time.perf_counter()
        jax.device_get((a, b))
        dt_pair = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.device_get(a)
        jax.device_get(b)
        dt_seq = time.perf_counter() - t0
        print(json.dumps({"label": "paired_vs_seq", "rep": rep,
                          "paired_s": round(dt_pair, 5),
                          "seq_s": round(dt_seq, 5)}), flush=True)

    # dispatch-only: time a tiny jitted program's full round trip
    # (dispatch + execute + 4B fetch) — the floor any fused-dispatch
    # stage pays regardless of payload.
    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    x = make(1024)
    tiny(x).block_until_ready()
    for rep in range(4):
        t0 = time.perf_counter()
        float(tiny(x))
        dt = time.perf_counter() - t0
        print(json.dumps({"label": "dispatch+4B", "rep": rep,
                          "rtt_s": round(dt, 5)}), flush=True)


if __name__ == "__main__":
    main()
