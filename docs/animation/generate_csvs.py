"""Generate CSV data for the docs flood-animation / visualizations.

TPU-native counterpart of the reference's docs asset generator
(reference docs/animation/generate_csvs.py:1-13): runs the real API on a
small figure-eight cloud and dumps points / landmarks / filtered edges /
filtered triangles for a front-end animation to replay the flooding
process (simplices appear at their filtration values).
"""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

import numpy as np

from flooder_tpu import (
    flood_complex,
    generate_figure_eight_points_2d,
    generate_landmarks,
)

pts = generate_figure_eight_points_2d(200, centers=((0.3, 0.5), (0.6, 0.5)), seed=7)
lms = generate_landmarks(pts, 25, start_idx=0)
f_dict = flood_complex(pts, lms)
edges = [(*i, j) for i, j in f_dict.items() if len(i) == 2]
triangles = [(*i, j) for i, j in f_dict.items() if len(i) == 3]

out = os.path.dirname(os.path.abspath(__file__))
np.savetxt(os.path.join(out, "points.csv"), np.asarray(pts), delimiter=",", fmt="%.8f")
np.savetxt(os.path.join(out, "landmarks.csv"), np.asarray(lms), delimiter=",", fmt="%.8f")
np.savetxt(os.path.join(out, "edges.csv"), np.asarray(edges), delimiter=",", fmt="%.8f")
np.savetxt(
    os.path.join(out, "triangles.csv"), np.asarray(triangles), delimiter=",", fmt="%.8f"
)
print(f"wrote {len(pts)} points, {len(lms)} landmarks, {len(edges)} edges, "
      f"{len(triangles)} triangles")
