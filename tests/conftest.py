"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the multi-chip sharding tests need
a mesh) and with x64 enabled so complex128 matches the reference accuracy
bounds (round-trip RMSE < 3e-10 requires double precision). Must run before
jax initialises a backend, hence environment variables here.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob
# reliably forces the CPU backend (needed both for complex128 and for the
# 8-virtual-device mesh).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
