"""Multi-chip parallel engine: device meshes, sharded column-streaming
forward/backward over `shard_map` with psum_scatter/all_to_all
redistribution."""

from .distributed import ColumnPlan, ShardedSwiftly
from .mesh import TILE_AXIS, make_tile_mesh

__all__ = ["ColumnPlan", "ShardedSwiftly", "TILE_AXIS", "make_tile_mesh"]
