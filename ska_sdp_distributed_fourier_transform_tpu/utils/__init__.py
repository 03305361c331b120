"""Utilities: transfer-safe host<->device movement, metrics/instrumentation,
checkpointing."""

from .transfer import device_rmse, get_complex, put_complex

__all__ = ["device_rmse", "get_complex", "put_complex"]
