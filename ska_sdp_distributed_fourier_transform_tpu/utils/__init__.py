"""Utilities: transfer-safe host<->device movement, profiling/metrics,
communication accounting, checkpoint/resume."""

from .checkpoint import StreamCheckpointer, input_digest, \
    load_checkpoint, save_checkpoint
from .memory_plan import MemoryPlan, catalogue_report, plan_config
from .observability import (
    MemorySampler,
    collective_bytes,
    engine_collective_bytes,
    get_and_write_transfer,
    human_readable_size,
    performance_report,
)
from .transfer import (
    device_rmse,
    get_complex,
    get_complex_local_shards,
    put_complex,
    put_complex_local,
)

__all__ = [
    "device_rmse",
    "get_complex",
    "get_complex_local_shards",
    "put_complex",
    "put_complex_local",
    "MemorySampler",
    "collective_bytes",
    "engine_collective_bytes",
    "get_and_write_transfer",
    "human_readable_size",
    "performance_report",
    "StreamCheckpointer",
    "input_digest",
    "load_checkpoint",
    "save_checkpoint",
    "MemoryPlan",
    "catalogue_report",
    "plan_config",
]
