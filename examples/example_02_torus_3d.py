"""Example 02: Flood PH of a noisy torus sample (1M points).

TPU-native port of the reference harness
(reference examples/example_02_torus_3d.py:23-106): FPS / complex / PH
timing split over 5 repetitions.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Honor a CPU-backend request at the config level via the one shared
# guard (flooder_tpu/_platform.py documents why the env var alone is
# not enough in this environment).
from flooder_tpu._platform import force_cpu_if_requested

force_cpu_if_requested()


import argparse
import time

import pandas as pd

from flooder_tpu import (
    flood_complex,
    generate_landmarks,
    generate_noisy_torus_points_3d,
)
from flooder_tpu.topology import SimplexTree

BLUE = "\033[94m"
YELLOW = "\033[93m"
RESET = "\033[0m"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=None)
    args = ap.parse_args()

    n_pts = 20_000 if args.small else 1_000_000
    n_lms = 200 if args.small else 2000
    reps = args.reps or (2 if args.small else 5)

    print(f"{YELLOW}Flood PH of a noisy torus sample ({n_pts} points)")
    print(f"{YELLOW}--------------------------------------------{RESET}")
    results = []
    for rep in range(reps):
        pts = generate_noisy_torus_points_3d(n_pts)
        # untimed transfer fence — keeps the backend's first-sync wait
        # out of the FPS timing (docs/performance.md "Cold path")
        import numpy as _np

        _ = _np.asarray(pts[:1])

        t0_fps = time.perf_counter()
        lms = generate_landmarks(pts, n_lms)
        lms.block_until_ready()
        t1_fps = time.perf_counter()

        # device warmup (compile cache)
        _ = flood_complex(pts[:10000], lms)

        t0_complex = time.perf_counter()
        out_complex = flood_complex(pts, lms, batch_size=64)
        t1_complex = time.perf_counter()

        t0_ph = time.perf_counter()
        st = SimplexTree()
        for simplex, filtration_value in out_complex.items():
            st.insert(simplex, filtration_value)
        st.make_filtration_non_decreasing()
        st.compute_persistence()
        t1_ph = time.perf_counter()

        print(
            f"{BLUE}{n_pts:8d} points ({n_lms} landmarks) | "
            f"Complex (Flood): {(t1_complex - t0_complex):6.2f} sec | "
            f"PH (Flood): {t1_ph - t0_ph:6.2f} sec | "
            f"FPS: {t1_fps - t0_fps:6.2f} sec{RESET}"
        )
        results.append(
            dict(
                rep=rep,
                n_pts=n_pts,
                n_lms=n_lms,
                method="Flood",
                complex_time=t1_complex - t0_complex,
                fps_time=t1_fps - t0_fps,
                ph_time=t1_ph - t0_ph,
            )
        )

    df = pd.DataFrame(results)
    summary = (
        df.groupby(["n_pts", "method"])
        .agg(
            fps_time_mean=("fps_time", "mean"),
            fps_time_std=("fps_time", "std"),
            complex_time_mean=("complex_time", "mean"),
            complex_time_std=("complex_time", "std"),
            ph_time_mean=("ph_time", "mean"),
            ph_time_std=("ph_time", "std"),
        )
        .reset_index()
    )
    for col, label in [
        ("fps_time", "FPS Time (s)"),
        ("complex_time", "Complex Time (s)"),
        ("ph_time", "PH Time (s)"),
    ]:
        summary[label] = summary.apply(
            lambda r, c=col: f"{r[f'{c}_mean']:.2f} ± {r[f'{c}_std']:.2f}", axis=1
        )
    print(f"\n{YELLOW}Summary of Timings (mean ± std over {reps} repetitions){RESET}")
    print(
        summary[
            ["n_pts", "method", "FPS Time (s)", "Complex Time (s)", "PH Time (s)"]
        ].to_string(index=False)
    )


if __name__ == "__main__":
    main()
