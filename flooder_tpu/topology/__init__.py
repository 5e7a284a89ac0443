"""Native topology layer.

The reference delegates all combinatorial topology to the gudhi C++/CGAL
wheel (SURVEY §2: DelaunayComplex, SimplexTree, persistence, AlphaComplex,
bottleneck_distance — reference core.py:130-132, 278-280, cli.py:471-479,
tests/test_flooder.py:60-75). flooder_tpu ships this layer natively:

- :class:`SimplexTree` — columnar (array-of-simplices) filtered complex with
  vectorized bulk operations and a gudhi-compatible method surface.
- :class:`DelaunayComplex` / :class:`AlphaComplex` — Delaunay triangulation
  (Qhull) and the alpha filtration computed with vectorized linear algebra.
- :func:`bottleneck_distance` — exact bottleneck matching between diagrams.
- Persistent homology — C++ twist/clearing boundary reduction
  (``flooder_tpu/native``), with a numpy fallback.
"""

from .simplex_tree import SimplexTree
from .delaunay import DelaunayComplex
from .alpha import AlphaComplex
from .bottleneck import bottleneck_distance

__all__ = [
    "SimplexTree",
    "DelaunayComplex",
    "AlphaComplex",
    "bottleneck_distance",
]
