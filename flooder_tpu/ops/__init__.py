from .fps import farthest_point_sampling
from .flood import flood_min_distances, simplex_bounding_balls

__all__ = [
    "farthest_point_sampling",
    "flood_min_distances",
    "simplex_bounding_balls",
]
