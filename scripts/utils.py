"""Shared CLI plumbing for the demo/benchmark drivers.

Mirrors the reference's `scripts/utils.py` surface (cli_parser with
``fromfile_prefix_chars="@"`` so ``@flagfile`` works, transfer-info
writing, human-readable sizes) on top of the TPU-native instrumentation
in :mod:`ska_sdp_distributed_fourier_transform_tpu.utils.observability`.
"""

from __future__ import annotations

import argparse
import os
import sys

# repo-root import when run as `python scripts/demo_api.py`
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ska_sdp_distributed_fourier_transform_tpu.utils.observability import (  # noqa: E402
    collective_bytes,
    engine_collective_bytes,
    get_and_write_transfer,
    human_readable_size,
)

__all__ = [
    "cli_parser",
    "setup_platform",
    "collective_bytes",
    "engine_collective_bytes",
    "get_and_write_transfer",
    "human_readable_size",
]


def setup_platform(args):
    """Apply ``--platform`` before any jax backend initialisation.

    The tile-streaming accuracy path needs the x64 CPU backend; the
    JAX_PLATFORMS env var is ignored by some TPU plugins, so the config
    knob is used. Must run before the first jax device query.
    """
    import jax

    platform = args.platform
    if platform == "auto":
        accel = getattr(args, "sharded", False) or getattr(
            args, "host_tier", False)
        platform = "tpu" if accel else "cpu"
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        n_mesh = getattr(args, "mesh_devices", None)
        if n_mesh and n_mesh > 1:
            import os

            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags
                    + f" --xla_force_host_platform_device_count={n_mesh}"
                ).strip()
    else:
        # single-chip arbitration (see utils/chiplock.py)
        from ska_sdp_distributed_fourier_transform_tpu.utils.chiplock \
            import acquire_chip_lock

        acquire_chip_lock("demo " + " ".join(sys.argv[:2]))
    return platform


def cli_parser():
    """Command-line parser with the reference's flags
    (reference scripts/utils.py:234-262, demo_api.py:154-173) plus the
    TPU-native engine switches.

    :return: argparse.ArgumentParser
    """
    parser = argparse.ArgumentParser(
        description="TPU-native streaming distributed Fourier transform",
        fromfile_prefix_chars="@",
    )
    parser.add_argument(
        "--swift_config",
        type=str,
        default="1k[1]-n512-256",
        help="Key(s) from SWIFT_CONFIGS; comma-separated list runs each "
        "in turn, e.g. '12k[1]-n6k-512,10k[1]-n5k-512'",
    )
    parser.add_argument(
        "--source_number",
        type=int,
        default=10,
        help="Number of point sources to add to the input data",
    )
    parser.add_argument(
        "--queue_size",
        type=int,
        default=20,
        help="Bounded dispatch-ahead depth (streaming flow control)",
    )
    parser.add_argument(
        "--lru_forward",
        type=int,
        default=1,
        help="Forward column-cache (NMBF_BF) capacity",
    )
    parser.add_argument(
        "--lru_backward",
        type=int,
        default=1,
        help="Backward column-accumulator (NAF_MNAF) cache capacity",
    )
    parser.add_argument(
        "--backend",
        type=str,
        default="jax",
        choices=["jax", "numpy", "native", "ska_sdp_func"],
        help="Numerical core for the tile-streaming path",
    )
    parser.add_argument(
        "--sharded",
        action="store_true",
        help="Run the dense sharded engine (shard_map over the device "
        "mesh) instead of the tile-streaming API",
    )
    parser.add_argument(
        "--host_tier",
        action="store_true",
        help="Run the host-streamed tier (StreamedSwiftly): facet-scale "
        "state in host RAM, only one column's working set on device — "
        "for configs beyond aggregate HBM (64k/128k)",
    )
    parser.add_argument(
        "--mesh_devices",
        type=int,
        default=None,
        help="With --host_tier: shard the per-column device working set "
        "over this many mesh devices (default: single device)",
    )
    parser.add_argument(
        "--engine_mode",
        type=str,
        default="matmul",
        choices=["matmul", "pallas", "fft"],
        help="Sharded-engine compute formulation",
    )
    parser.add_argument(
        "--fft_impl",
        type=str,
        default="mxu",
        choices=["mxu", "xla"],
        help="yN-scale facet transforms in the sharded engine: four-step "
        "MXU factor matmuls (default) or the XLA FFT",
    )
    parser.add_argument(
        "--platform",
        type=str,
        default="auto",
        choices=["auto", "cpu", "tpu"],
        help="'cpu' forces the x64 CPU backend (reference-grade "
        "accuracy); 'tpu' uses the accelerator (complex64). 'auto' "
        "picks cpu for the tile-streaming path and the default device "
        "for --sharded",
    )
    parser.add_argument(
        "--profile_dir",
        type=str,
        default=None,
        help="Write a jax profiler trace (xplane) for the run here",
    )
    parser.add_argument(
        "--memory_csv",
        type=str,
        default=None,
        help="Write per-device memory samples to this CSV",
    )
    parser.add_argument(
        "--transfer_info",
        type=str,
        default=None,
        help="Append collective-byte accounting to this file",
    )
    parser.add_argument(
        "--checkpoint",
        type=str,
        default=None,
        help="Checkpoint file for the --sharded fused stream; an "
        "interrupted run resumes from the last completed segment",
    )
    parser.add_argument(
        "--checkpoint_every",
        type=int,
        default=8,
        help="Columns per checkpoint segment (with --checkpoint)",
    )
    return parser
