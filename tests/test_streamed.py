"""Host-streamed engine (StreamedSwiftly) + memory planning tests.

The host tier is the TPU-native analogue of the reference's large-memory
Dask workers (reference slurm_scripts/run_distr_single_csd3.slurm keeps
facet state in 512 GiB host RAM): BF_F and the accumulator live on host,
the device holds one column's working set. Correctness anchors:

* the reference round-trip bound (<3e-10, reference tests/test_api.py:125)
  at the canonical N=1024 parameters, complex128;
* chunking invariance — batch/prepare chunk sizes change dispatch
  granularity only, results must be bit-identical;
* agreement with the device-resident sharded engine;
* per-subgrid agreement with the direct-DFT oracle.
"""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu import (
    SwiftlyConfig,
    make_facet,
    make_full_facet_cover,
    make_full_subgrid_cover,
    make_subgrid,
)
from ska_sdp_distributed_fourier_transform_tpu.parallel import (
    ShardedSwiftly,
    StreamedSwiftly,
    make_tile_mesh,
)
from ska_sdp_distributed_fourier_transform_tpu.utils.memory_plan import (
    HBM_BYTES,
    catalogue_report,
    plan_config,
)

CANONICAL = dict(
    W=13.5625, fov=1.0, N=1024, yB_size=416, yN_size=512,
    xA_size=228, xM_size=256,
)
SOURCES = [(1.0, 10, -30), (0.5, -200, 5), (0.25, 100, 100)]


def _covers(params):
    config = SwiftlyConfig(**params)
    return (
        config,
        make_full_facet_cover(config),
        make_full_subgrid_cover(config),
    )


def _rmse(a, b):
    return float(np.sqrt(np.mean(np.abs(np.asarray(a) - np.asarray(b)) ** 2)))


def test_streamed_roundtrip_reference_bound():
    config, fc, sc = _covers(CANONICAL)
    eng = StreamedSwiftly(config._core, fc, sc)
    # the reference's acceptance sources (reference tests/test_api.py:66)
    sources = [(1, 1, 0)]
    facets = [make_facet(config.image_size, cfg, sources) for cfg in fc]
    out, n = eng.roundtrip(facets)
    assert n == len(sc)
    errs = [_rmse(out[i], facets[i]) for i in range(len(fc))]
    assert max(errs) < 3e-10  # reference tests/test_api.py:125


def test_streamed_chunking_invariance():
    """Batch/prepare chunk sizes are dispatch granularity only."""
    config, fc, sc = _covers(CANONICAL)
    facets = [make_facet(config.image_size, cfg, SOURCES) for cfg in fc]
    eng_a = StreamedSwiftly(config._core, fc, sc)
    out_a, _ = eng_a.roundtrip(facets)
    eng_b = StreamedSwiftly(
        config._core, fc, sc, batch_chunk=2, prepare_chunk=97
    )
    out_b, _ = eng_b.roundtrip(facets)
    for a, b in zip(out_a, out_b):
        # chunking reorders the scatter-add fold, so agreement is to
        # accumulation rounding, not bit-exact
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-13
        )


def test_streamed_matches_sharded_engine():
    config, fc, sc = _covers(CANONICAL)
    facets = [make_facet(config.image_size, cfg, SOURCES) for cfg in fc]

    streamed = StreamedSwiftly(config._core, fc, sc)
    out_s, _ = streamed.roundtrip(facets)

    mesh = make_tile_mesh(1)
    sharded = ShardedSwiftly(config._core, fc, sc, mesh)
    packed = sharded.pack_facets(facets)
    out_d, _ = sharded.roundtrip(packed)
    for i in range(len(fc)):
        assert _rmse(out_s[i], np.asarray(out_d[i])) < 1e-10


@pytest.mark.parametrize("n_devices", [4, 8])
def test_streamed_mesh_matches_single_device(n_devices):
    """The mesh-sharded host tier (facet-sharded column compute,
    psum_scatter/all_to_all redistribution, host facet state) computes
    the same round trip as the single-device host tier, at the
    reference bound. n_devices=8 does not divide F=9 — exercises facet
    padding."""
    config, fc, sc = _covers(CANONICAL)
    sources = [(1, 1, 0)]
    facets = [make_facet(config.image_size, cfg, sources) for cfg in fc]
    eng_1 = StreamedSwiftly(config._core, fc, sc)
    out_1, _ = eng_1.roundtrip(facets)
    mesh = make_tile_mesh(n_devices)
    eng_m = StreamedSwiftly(config._core, fc, sc, mesh=mesh)
    assert eng_m.F_pad % n_devices == 0
    out_m, n = eng_m.roundtrip(facets)
    assert n == len(sc)
    errs = [_rmse(out_m[i], facets[i]) for i in range(len(fc))]
    assert max(errs) < 3e-10  # reference tests/test_api.py:125
    for a, b in zip(out_1, out_m):
        assert _rmse(a, b) < 1e-12


def test_streamed_process_local_matches_mesh():
    """process_local=True on a single process (all mesh devices local)
    is bit-identical to the plain mesh path — same compiled program,
    only the host-side shard assembly differs. The cross-process case
    is tests/test_multihost.py::test_two_process_host_tier."""
    config, fc, sc = _covers(CANONICAL)
    sources = [(1, 1, 0)]
    facets = [make_facet(config.image_size, cfg, sources) for cfg in fc]
    mesh = make_tile_mesh(8)
    eng_m = StreamedSwiftly(config._core, fc, sc, mesh=mesh)
    assert not eng_m.process_local  # auto stays off single-process
    out_m, _ = eng_m.roundtrip(facets)
    eng_p = StreamedSwiftly(
        config._core, fc, sc, mesh=mesh, process_local=True
    )
    assert eng_p._store_fidx == list(range(len(fc)))
    out_p, n = eng_p.roundtrip(facets)
    assert n == len(sc)
    for a, b in zip(out_m, out_p):
        assert _rmse(a, b) == 0.0


def test_streamed_checkpoint_resume(tmp_path):
    """An interrupted host-tier round trip resumes from its checkpoint
    and reproduces the uninterrupted result exactly."""
    config, fc, sc = _covers(CANONICAL)
    facets = [make_facet(config.image_size, cfg, SOURCES) for cfg in fc]
    eng = StreamedSwiftly(config._core, fc, sc)
    out_ref, _ = eng.roundtrip(facets)
    ckpt = str(tmp_path / "host_tier.npz")
    eng2 = StreamedSwiftly(config._core, fc, sc)
    out, done = eng2.roundtrip(
        facets, checkpoint=ckpt, stop_after_columns=3
    )
    assert out is None and done == 3
    eng3 = StreamedSwiftly(config._core, fc, sc)
    out_res, n = eng3.roundtrip(facets, checkpoint=ckpt)
    assert n == len(sc)
    for a, b in zip(out_ref, out_res):
        assert _rmse(a, b) == 0.0


def test_streamed_checkpoint_rejects_different_inputs(tmp_path):
    """A checkpoint from one input set must not satisfy a run on
    different inputs — the input digest forces a fresh start."""
    config, fc, sc = _covers(CANONICAL)
    facets_a = [make_facet(config.image_size, cfg, SOURCES) for cfg in fc]
    facets_b = [
        make_facet(config.image_size, cfg, [(2.0, 7, -3)]) for cfg in fc
    ]
    ckpt = str(tmp_path / "host_tier.npz")
    eng = StreamedSwiftly(config._core, fc, sc)
    out, done = eng.roundtrip(
        facets_a, checkpoint=ckpt, stop_after_columns=3
    )
    assert out is None
    # same path, different inputs: resume must NOT pick up the stale
    # accumulator (it would silently mix two runs)
    eng2 = StreamedSwiftly(config._core, fc, sc)
    out_b, n = eng2.roundtrip(facets_b, checkpoint=ckpt)
    assert n == len(sc)
    eng3 = StreamedSwiftly(config._core, fc, sc)
    out_ref, _ = eng3.roundtrip(facets_b)  # no checkpoint at all
    for a, b in zip(out_b, out_ref):
        assert _rmse(a, b) == 0.0  # bit-identical to a fresh run


def test_streamed_mesh_collects_subgrids():
    """Per-subgrid collection through the mesh path matches the
    direct-DFT oracle."""
    from ska_sdp_distributed_fourier_transform_tpu import check_subgrid

    config, fc, sc = _covers(CANONICAL)
    facets = [make_facet(config.image_size, cfg, SOURCES) for cfg in fc]
    eng = StreamedSwiftly(
        config._core, fc, sc, mesh=make_tile_mesh(4)
    )
    eng.prepare_facets(facets)
    eng.zero_accumulator()
    got = eng.process_column(0, collect_subgrids=True)
    assert got
    for cfg, sg in got:
        assert check_subgrid(
            config.image_size, cfg, np.asarray(sg), SOURCES
        ) < 3e-10


def test_streamed_forward_subgrids_vs_oracle():
    config, fc, sc = _covers(CANONICAL)
    eng = StreamedSwiftly(config._core, fc, sc, batch_chunk=3)
    facets = [make_facet(config.image_size, cfg, SOURCES) for cfg in fc]
    eng.prepare_facets(facets)
    eng.zero_accumulator()
    got = eng.process_column(1, collect_subgrids=True)
    assert got
    for cfg, sg in got:
        oracle = make_subgrid(config.image_size, cfg, SOURCES)
        assert _rmse(sg, oracle) < 1e-8


# --------------------------------------------------------- memory planning


def test_memory_plan_16k_single_chip():
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    plan = plan_config(SWIFT_CONFIGS["16k[1]-n8k-512"], 1)
    assert plan.fits_device
    # BENCH_SWEEP.md measured ~2x3.3 GB for BF_F + accumulator at F=9
    assert abs(plan.device_resident["BF_F"] - 9 * 8192 * 5632 * 8) < 1e6


def test_memory_plan_32k_production_mesh():
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    # The reference's demonstrated CSD3 workload fits an 8- or 9-chip mesh
    for n in (8, 9):
        plan = plan_config(SWIFT_CONFIGS["32k[1]-n16k-1k"], n)
        assert plan.fits_device, plan.summary()
    # ... but not a single chip
    assert not plan_config(SWIFT_CONFIGS["32k[1]-n16k-1k"], 1).fits_device


def test_memory_plan_128k_host_tier():
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    plan = plan_config(SWIFT_CONFIGS["128k[1]-n64k-1k"], 9)
    assert not plan.fits_device  # facet arrays exceed 16 GB HBM
    assert plan.fits_host_tier  # but the host-streamed tier runs it
    assert plan.host_peak_device < HBM_BYTES
    # and the mesh host tier divides the per-column footprint ~3x
    assert plan.fits_host_mesh
    assert plan.host_mesh_peak_device < plan.host_peak_device / 2


def test_memory_plan_catalogue_complete():
    """Every SWIFT_CONFIGS entry must be runnable on some tier."""
    report = catalogue_report()
    assert len(report) == 244
    bad = {k: v for k, v in report.items() if v["tier"] == "infeasible"}
    assert not bad, bad
    tiers = {v["tier"] for v in report.values()}
    assert tiers <= {"device", "host"}

def test_streamed_accum_dtype_c64_matches_default():
    """accum_dtype=complex64 halves the host accumulator's RAM and is
    equivalent at the engine's c64 working precision (each accumulator
    element receives only the adds of overlapping column windows)."""
    config, fc, sc = _covers(CANONICAL)
    sources = [(1, 1, 0)]
    facets = [make_facet(config.image_size, cfg, sources) for cfg in fc]
    eng_d = StreamedSwiftly(config._core, fc, sc)
    out_d, _ = eng_d.roundtrip(facets)
    eng_c = StreamedSwiftly(config._core, fc, sc,
                            accum_dtype=np.complex64)
    assert eng_c.accum_dtype == np.dtype(np.complex64)
    out_c, n = eng_c.roundtrip(facets)
    assert n == len(sc)
    for a, b, f in zip(out_d, out_c, facets):
        assert _rmse(a, b) < 1e-6  # c64 rounding only
        assert _rmse(b, np.asarray(f)) < 1e-4


def test_memory_plan_host_accum_dtype():
    """The host-tier RAM model reflects the real accumulator dtype:
    complex128 by default (StreamedSwiftly.zero_accumulator), halved
    by accum_dtype=complex64."""
    from ska_sdp_distributed_fourier_transform_tpu.swift_configs import (
        SWIFT_CONFIGS,
    )

    params = SWIFT_CONFIGS["64k[1]-n32k-512"]
    p128 = plan_config(params, 1)
    p64 = plan_config(params, 1, host_accum_bytes=8)
    F, yN, yB = p128.F, params["yN_size"], params["yB_size"]
    assert p128.host_bytes == F * yN * yB * 24  # c64 BF_F + c128 accum
    assert p64.host_bytes == F * yN * yB * 16
