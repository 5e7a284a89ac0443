#!/usr/bin/env python3
"""Pre-warm the persistent compile cache for the witness-ordering program.

The kd ordering's one variadic sort dominates AOT compile at ~2 minutes
per power-of-two cloud-size bucket on this backend (measured 2026-08-19;
see docs/performance.md "Cold path"). The persistent cache
(~/.cache/flooder_tpu/jax) makes each bucket once-per-machine — this
tool front-loads that cost for a ladder of bucket sizes so production
pipelines never pay it mid-run. Buckets at or below the host-ordering
threshold compile nothing and are skipped.

Usage:
    python tools/warm_compile_cache.py                 # 3-D ladder to 67M
    python tools/warm_compile_cache.py --dims 2 3 --max-points 40000000

Only the kd program is warmed: the flood/FPS kernel compiles are tens of
seconds per geometry (not minutes) and depend on landmark counts and
sample modes the tool cannot enumerate.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bucket_totals(max_points: int, wchunk: int):
    """Padded witness totals for clouds up to ``max_points`` (the engine
    buckets the chunk count to a power of two; pallas_flood.py)."""
    totals = []
    n_chunks = 1
    while True:
        total = n_chunks * wchunk
        totals.append(total)
        if total >= max_points:
            break
        n_chunks *= 2
    return totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs="+", default=[3])
    ap.add_argument("--max-points", type=int, default=67_108_864)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import flooder_tpu  # noqa: F401  (enables the persistent cache)
    from flooder_tpu.ops.pallas_flood import (
        SUB,
        WCHUNK,
        kd_order_device,
        use_host_kd,
    )

    print(f"backend: {jax.default_backend()}", flush=True)
    for dim in args.dims:
        for total in bucket_totals(args.max_points, WCHUNK):
            if use_host_kd(total, SUB):
                continue  # host-ordered: nothing to compile
            # EXECUTE the jitted function rather than AOT
            # lower().compile(): on this backend the AOT path writes
            # cache entries under a different key than the runtime call
            # (observed 2026-08-19: a 67M AOT warm did not prevent the
            # subsequent pipeline run from recompiling), so only a real
            # call warms the key production hits. Zeros are fine — the
            # compile is shape-keyed and the run is one stable sort per
            # level.
            t0 = time.perf_counter()
            kd_order_device(
                jnp.zeros((total, dim), jnp.float32), leaf=SUB
            ).block_until_ready()
            print(
                f"kd bucket total={total} dim={dim}: "
                f"{time.perf_counter() - t0:.1f}s (compile+run)",
                flush=True,
            )


if __name__ == "__main__":
    main()
