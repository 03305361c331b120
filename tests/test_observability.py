"""Tests for profiling/memory/communication accounting utilities."""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.utils.observability import (
    MemorySampler,
    collective_bytes,
    engine_collective_bytes,
    get_and_write_transfer,
    human_readable_size,
)


def test_human_readable_size():
    assert human_readable_size(512) == "512.000B"
    assert human_readable_size(2048, 1) == "2.0KiB"
    assert human_readable_size(3 * 1024**3, 0) == "3GiB"


def test_collective_bytes_parses_hlo_text():
    hlo = """
HloModule m
ENTRY e {
  %p = f32[2,8,128]{2,1,0} parameter(0)
  %a2a = f32[2,8,128]{2,1,0} all-to-all(%p), dimensions={1}
  %ar = bf16[64]{0} all-reduce(%x), replica_groups={}
  %rs-start = (f32[8,4]{1,0}, f32[4,4]{1,0}) reduce-scatter-start(%y)
  %rs-done = f32[4,4]{1,0} reduce-scatter-done(%rs-start)
  %add = f32[2,8,128]{2,1,0} add(%a2a, %a2a)
}
"""
    info = collective_bytes(hlo)
    assert info["all-to-all"] == 2 * 8 * 128 * 4
    assert info["all-reduce"] == 64 * 2
    # async pairs counted once, via the -done op (the -start shape is a
    # tuple carrying operand aliases, which would double-count)
    assert info.get("reduce-scatter", 0) == 4 * 4 * 4
    assert "reduce-scatter-start" not in info
    assert "reduce-scatter-done" not in info
    assert info["total"] == sum(v for k, v in info.items() if k != "total")


def test_memory_sampler_csv(tmp_path):
    import time

    ms = MemorySampler(interval=0.01)
    with ms.sample("phase1"):
        time.sleep(0.05)
    assert len(ms.rows) >= 2
    path = tmp_path / "mem.csv"
    ms.to_csv(path)
    header = path.read_text().splitlines()[0]
    assert header.startswith("label,time_s,device")


def test_transfer_info_file(tmp_path):
    hlo = "%x = f32[1024]{0} all-gather(%p), dimensions={0}"
    path = tmp_path / "transfer.txt"
    info = get_and_write_transfer(hlo, path, key="t", executions=3)
    assert info["all-gather"] == 4096
    text = path.read_text()
    assert "t: total 12.000KiB" in text


def test_engine_collective_bytes_mesh():
    """The sharded engine's column programs declare the redistribution:
    a reduce-scatter forward, an all-to-all backward, nothing in
    prepare/finish."""
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        ShardedSwiftly,
        make_tile_mesh,
    )

    config = SwiftlyConfig(
        W=13.5625, fov=1.0, N=512, yB_size=192, yN_size=256, xA_size=192,
        xM_size=256,
    )
    engine = ShardedSwiftly(
        config._core,
        make_full_facet_cover(config),
        make_full_subgrid_cover(config),
        make_tile_mesh(4),
    )
    info = engine_collective_bytes(engine)
    assert info["prepare"]["total"] == 0
    assert info["finish"]["total"] == 0
    assert info["fwd_column"]["total"] > 0
    assert info["bwd_column"]["total"] > 0
    assert any("all-to-all" in k for k in info["bwd_column"])


def test_performance_report(tmp_path):
    import jax
    import jax.numpy as jnp

    from ska_sdp_distributed_fourier_transform_tpu.utils import (
        performance_report,
    )

    with performance_report(tmp_path):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    traces = list(tmp_path.rglob("*.xplane.pb"))
    assert traces, "no profiler trace written"
