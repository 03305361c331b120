"""Multi-chip parallel engine: device meshes, sharded column-streaming
forward/backward over `shard_map` with psum_scatter/all_to_all
redistribution, plus the host-streamed tier for configs larger than
device memory."""

from .distributed import ColumnPlan, ShardedSwiftly
from .mesh import TILE_AXIS, make_tile_mesh
from .split_stream import SplitSwiftly
from .streamed import StreamedSwiftly

__all__ = [
    "ColumnPlan",
    "ShardedSwiftly",
    "SplitSwiftly",
    "StreamedSwiftly",
    "TILE_AXIS",
    "make_tile_mesh",
]
