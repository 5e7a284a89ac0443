"""Example 01: Runtime measurements for Alpha PH vs. Flood PH on 3D cheese data.

TPU-native port of the reference benchmark harness
(reference examples/example_01_cheese_3d.py:23-134): sweep cloud sizes,
time the gudhi-style Alpha pipeline (here flooder_tpu's native alpha
complex) against Flood PH, summarize with pandas.

Run with --small for a quick laptop/CI-sized sweep.
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

from flooder_tpu import flood_complex, generate_swiss_cheese_points
from flooder_tpu.topology import AlphaComplex, SimplexTree

RED = "\033[91m"
BLUE = "\033[94m"
YELLOW = "\033[93m"
RESET = "\033[0m"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true", help="CI-sized sweep")
    ap.add_argument("--reps", type=int, default=None)
    ap.add_argument(
        "--alpha-max-n",
        type=int,
        default=None,
        help="skip the Alpha-PH baseline above this cloud size (the host "
        "Alpha at 1M+ points costs minutes-to-hours on one core and its "
        "reference numbers are already recorded in BASELINE.md; the Flood "
        "rows still run at every size)",
    )
    args = ap.parse_args()

    if args.small:
        n_pts_list = [2000, 5000]
        batch_sizes = [256, 256]
        reps = args.reps or 1
        n_lms = 100
    else:
        n_pts_list = [10000, 100000, 1000000, 10000000]
        batch_sizes = [1024, 1024, 256, 64]
        reps = args.reps or 5
        n_lms = 1000
    rect_min = (0.0, 0.0, 0.0)
    rect_max = (1.0, 1.0, 1.0)
    void_radius_range = (0.1, 0.2)
    k = 6
    dim = len(rect_min)

    results = []

    print(f"{YELLOW}Alpha PH vs. Flood PH timing on cheese")
    print(f"{YELLOW}--------------------------------------{RESET}")
    for i, n_pts in enumerate(n_pts_list):
        for rep in range(reps):
            points, _, _ = generate_swiss_cheese_points(
                n_pts, rect_min, rect_max, k, void_radius_range
            )
            # Untimed transfer fence: the first device-to-host sync of a
            # process can absorb minutes of backend-side wait (see
            # docs/performance.md "Cold path"); without this the Alpha
            # row below — whose np.asarray(points) is that first sync —
            # would be billed for it. Plays the role of the reference's
            # pre-timing GPU warm-up (ref example_01:78-82).
            import numpy as _np

            _ = _np.asarray(points[:1])

            if args.alpha_max_n is not None and n_pts > args.alpha_max_n:
                print(
                    f"{RED}{n_pts:8d} points (try {rep}) | "
                    f"Alpha skipped (--alpha-max-n {args.alpha_max_n}){RESET}"
                )
            else:
                startt = time.perf_counter()
                alpha = AlphaComplex(points).create_simplex_tree(
                    output_squared_values=False
                )
                t1 = time.perf_counter() - startt
                alpha.compute_persistence()
                t2 = time.perf_counter() - startt
                print(
                    f"{RED}{n_pts:8d} points (try {rep}) | "
                    f"Complex (Alpha): {t1:6.2f} sec | "
                    f"PH (Alpha): {t2:6.2f} sec{RESET}"
                )
                results.append(
                    dict(
                        rep=rep, n_pts=n_pts, method="Alpha",
                        complex_time=t1, ph_time=t2,
                    )
                )
                _ = alpha.persistence_intervals_in_dimension(dim - 1)

            # device warmup (compile cache)
            _ = flood_complex(points[:2000], n_lms, batch_size=batch_sizes[i])

            startt = time.perf_counter()
            out_complex = flood_complex(points, n_lms, batch_size=batch_sizes[i])
            st = SimplexTree()
            for simplex in out_complex:
                st.insert(simplex, out_complex[simplex])
            st.make_filtration_non_decreasing()
            t1 = time.perf_counter() - startt
            st.compute_persistence()
            t2 = time.perf_counter() - startt
            print(
                f"{BLUE}{n_pts:8d} points (try {rep}) | "
                f"Complex (Flood): {t1:6.2f} sec | "
                f"PH (Flood): {t2:6.2f} sec{RESET}"
            )
            results.append(
                dict(rep=rep, n_pts=n_pts, method="Flood", complex_time=t1, ph_time=t2)
            )
            _ = st.persistence_intervals_in_dimension(dim - 1)

    df = pd.DataFrame(results)
    summary = (
        df.groupby(["n_pts", "method"])
        .agg(
            complex_mean=("complex_time", "mean"),
            complex_std=("complex_time", "std"),
            ph_mean=("ph_time", "mean"),
            ph_std=("ph_time", "std"),
        )
        .reset_index()
    )
    summary["Complex Time (s)"] = summary.apply(
        lambda r: f"{r['complex_mean']:.2f} ± {r['complex_std']:.2f}", axis=1
    )
    summary["PH Time (s)"] = summary.apply(
        lambda r: f"{r['ph_mean']:.2f} ± {r['ph_std']:.2f}", axis=1
    )
    print(f"\n{YELLOW}Summary of Timings (mean ± std over {reps} repetitions){RESET}")
    print(
        summary[["n_pts", "method", "Complex Time (s)", "PH Time (s)"]].to_string(
            index=False
        )
    )


if __name__ == "__main__":
    main()
