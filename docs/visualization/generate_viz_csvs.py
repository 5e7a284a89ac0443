"""Generate Flood-complex visualization data for the docs viewers.

TPU-native counterpart of the reference's visualization assets
(reference docs/visualization/*/): for each showcase cloud, run the real
pipeline (1M points, 1000 FPS landmarks, grid sampling) and dump the
landmark coordinates plus every edge / triangle / tetrahedron with its
filtration value, for docs/visualization/complex_viewer.js to replay at
increasing radii.

The reference showcases downloaded scans (virus / coral / lockwasher);
this environment is offline, so the showcases are synthetic clouds with
comparable topological character: a noisy torus, a swiss-cheese cube
(cavities), and a washer (annulus extruded in z — the lockwasher
analogue).

Run from the repo root: ``python docs/visualization/generate_viz_csvs.py``
(a TPU chip makes it fast; CPU works with ``--points 200000``).
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from flooder_tpu._platform import force_cpu_if_requested

force_cpu_if_requested()

import numpy as np

from flooder_tpu import (
    flood_complex,
    generate_annulus_points_2d,
    generate_noisy_torus_points_3d,
    generate_swiss_cheese_points,
)
from flooder_tpu.core import generate_landmarks


def washer_points(n, seed):
    """Annulus extruded in z — the lockwasher-shaped showcase."""
    ring = np.asarray(
        generate_annulus_points_2d(n, radius=1.0, width=0.4, seed=seed)
    )
    rng = np.random.default_rng(seed)
    z = rng.uniform(0.0, 0.18, size=(n, 1)).astype(np.float32)
    return np.concatenate([ring, z], axis=1).astype(np.float32)


def dump(name, pts, out_root, n_landmarks):
    lms = generate_landmarks(pts, n_landmarks, start_idx=0)
    fc = flood_complex(pts, lms)
    folder = os.path.join(out_root, name)
    os.makedirs(folder, exist_ok=True)
    np.savetxt(
        os.path.join(folder, "landmarks.csv"),
        np.asarray(lms), delimiter=",", fmt="%.8f",
    )
    by_card = {2: [], 3: [], 4: []}
    for simplex, val in fc.items():
        if len(simplex) in by_card and np.isfinite(val):
            by_card[len(simplex)].append((*simplex, val))
    for card, fname in ((2, "edges.csv"), (3, "triangles.csv"),
                        (4, "tetrahedra.csv")):
        rows = np.asarray(by_card[card], dtype=np.float64)
        if rows.size == 0:
            rows = rows.reshape(0, card + 1)
        np.savetxt(
            os.path.join(folder, fname), rows, delimiter=",", fmt="%.8f"
        )
    vals = np.asarray([v for v in fc.values() if np.isfinite(v)])
    print(
        f"{name}: {len(by_card[2])} edges, {len(by_card[3])} triangles, "
        f"{len(by_card[4])} tetrahedra; filtration p50/p95 = "
        f"{np.percentile(vals, 50):.4f}/{np.percentile(vals, 95):.4f}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--landmarks", type=int, default=1000)
    ap.add_argument(
        "--only", choices=["torus", "cheese", "washer"], default=None,
        help="generate a single dataset (the washer's sliver tetrahedra "
        "make it much slower than the others on CPU)",
    )
    args = ap.parse_args()

    out_root = os.path.dirname(os.path.abspath(__file__))
    if args.only in (None, "torus"):
        torus = generate_noisy_torus_points_3d(args.points, seed=42)
        dump("torus", torus, out_root, args.landmarks)
    if args.only in (None, "cheese"):
        cheese, _, _ = generate_swiss_cheese_points(
            args.points, k=6, seed=42
        )
        dump("cheese", cheese, out_root, args.landmarks)
    if args.only in (None, "washer"):
        dump("washer", washer_points(args.points, seed=42), out_root,
             args.landmarks)


if __name__ == "__main__":
    main()
