from .sharding import MeshFloodEngine, make_mesh, sharded_flood_min_distances

__all__ = ["MeshFloodEngine", "make_mesh", "sharded_flood_min_distances"]
