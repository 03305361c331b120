"""Checkpoint/resume tests: array round trip (HDF5 and npz), and a
mid-stream kill/resume of the sharded engine reproducing the
uninterrupted result exactly."""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu import (
    SwiftlyConfig,
    make_facet,
    make_full_facet_cover,
    make_full_subgrid_cover,
)
from ska_sdp_distributed_fourier_transform_tpu.parallel import (
    ShardedSwiftly,
    make_tile_mesh,
)
from ska_sdp_distributed_fourier_transform_tpu.utils import (
    StreamCheckpointer,
    load_checkpoint,
    save_checkpoint,
)

TEST_PARAMS = dict(
    W=13.5625, fov=1.0, N=512, yB_size=192, yN_size=256, xA_size=192,
    xM_size=256,
)


def test_array_round_trip(tmp_path):
    path = str(tmp_path / "ck.h5")
    rng = np.random.default_rng(0)
    arrays = {
        "c": rng.normal(size=(4, 8)) + 1j * rng.normal(size=(4, 8)),
        "r": rng.normal(size=(3,)).astype(np.float32),
    }
    save_checkpoint(path, arrays, {"step": 7, "tag": "x"})
    loaded, meta = load_checkpoint(path)
    assert meta == {"step": 7, "tag": "x"}
    np.testing.assert_array_equal(loaded["c"], arrays["c"])
    np.testing.assert_array_equal(loaded["r"], arrays["r"])


def test_jax_array_checkpoint(tmp_path):
    import jax.numpy as jnp

    path = str(tmp_path / "ck.h5")
    x = jnp.asarray(np.arange(6.0).reshape(2, 3) + 1j)
    save_checkpoint(path, {"x": x}, {})
    loaded, _ = load_checkpoint(path)
    np.testing.assert_allclose(loaded["x"], np.asarray(x))


def _build(n_devices=4):
    config = SwiftlyConfig(**TEST_PARAMS)
    fcs = make_full_facet_cover(config)
    sgs = make_full_subgrid_cover(config)
    engine = ShardedSwiftly(
        config._core, fcs, sgs, make_tile_mesh(n_devices)
    )
    facets = [make_facet(config.image_size, c, [(1, 1, 0)]) for c in fcs]
    return config, engine, facets


def test_stream_resume_matches_uninterrupted(tmp_path):
    path = str(tmp_path / "stream.h5")
    _, engine, facets = _build()
    packed = engine.pack_facets(facets)
    BF_F = engine.prepare_facets(packed)
    n_cols = engine.plan.n_columns
    assert n_cols >= 2

    # Uninterrupted run
    ref, _ = engine.roundtrip(packed)
    ref = np.asarray(ref)

    # Interrupted run: checkpoint after every column, "die" after the
    # first, then resume and complete.
    ckpt = StreamCheckpointer(engine, path, every=1)
    accum, start = ckpt.resume()
    assert start == 0
    sg = engine.forward_column(BF_F, 0)
    accum = engine.backward_column(sg, 0, accum)
    accum = ckpt.step(accum, 0)
    del accum  # simulate the process dying here

    accum2, start2 = ckpt.resume()
    assert start2 == 1
    for ci in range(start2, n_cols):
        sg = engine.forward_column(BF_F, ci)
        accum2 = engine.backward_column(sg, ci, accum2)
        accum2 = ckpt.step(accum2, ci)
    out = np.asarray(engine.finish_facets(accum2))

    np.testing.assert_allclose(out, np.asarray(ref), atol=1e-12)


def test_resume_rejects_mismatched_engine(tmp_path):
    path = str(tmp_path / "stream.h5")
    _, engine, facets = _build()
    ckpt = StreamCheckpointer(engine, path, every=1)
    accum, _ = ckpt.resume()
    ckpt.step(accum, 0)

    # Same checkpoint, different geometry -> fresh start
    params = dict(TEST_PARAMS, N=1024, yB_size=416, yN_size=512,
                  xA_size=228)
    config2 = SwiftlyConfig(**params)
    engine2 = ShardedSwiftly(
        config2._core,
        make_full_facet_cover(config2),
        make_full_subgrid_cover(config2),
        make_tile_mesh(4),
    )
    ckpt2 = StreamCheckpointer(engine2, path, every=1)
    _, start = ckpt2.resume()
    assert start == 0


def test_fused_stream_checkpoint_resume(tmp_path):
    """Kill/resume of the checkpointed FUSED stream (chunked scan)
    reproduces the uninterrupted fused result."""
    path = str(tmp_path / "fused.h5")
    _, engine, facets = _build()
    packed = engine.pack_facets(facets)

    # Uninterrupted fused round trip for reference.
    want, n_want = engine.roundtrip(engine.pack_facets(facets))
    want = np.asarray(want)

    # Partial run: two 2-column segments, then "preemption".
    ck = StreamCheckpointer(engine, path, every=2)
    BF_F = engine.prepare_facets(packed)
    acc, start = ck.resume_stream(engine)
    assert start == 0
    acc = engine.stream_segment(BF_F, acc, 0, 2)
    ck.step_stream(acc, 2)
    del engine, BF_F, acc

    # Fresh engine (new process in reality) resumes from the checkpoint
    # and completes.
    _, engine2, facets2 = _build()
    ck2 = StreamCheckpointer(engine2, path, every=2)
    _, start2 = ck2.resume_stream(engine2)
    assert start2 == 2
    packed2 = engine2.pack_facets(facets2)
    got, n_got = engine2.roundtrip_checkpointed(packed2, ck2, segment=2)
    assert n_got == n_want
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-12)


def test_fused_stream_checkpoint_fresh_run(tmp_path):
    """roundtrip_checkpointed from scratch matches the plain fused
    stream bit-for-bit (same per-column program, chunked scan only)."""
    path = str(tmp_path / "fresh.h5")
    _, engine, facets = _build()
    want, _ = engine.roundtrip(engine.pack_facets(facets))
    ck = StreamCheckpointer(engine, path, every=3)
    got, _ = engine.roundtrip_checkpointed(
        engine.pack_facets(facets), ck, segment=3
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-13
    )
