"""Tests for the fused split-precision Pallas kernel
(:mod:`ska_sdp_distributed_fourier_transform_tpu.ops.pallas_split`).

Interpret-mode on CPU; the compiled path is exercised on hardware by
``bench.py --precision split`` (which auto-selects kernel="pallas" on
TPU).
"""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_split import (
    choose_chunking,
    df_fft_pallas,
    dfc_matmul,
    gather_prechunked_rows,
    prechunk_const,
)
from ska_sdp_distributed_fourier_transform_tpu.ops.split_precision import (
    cdf_from_c128,
    cdf_to_c128,
    df_fft_mxu,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _run(data, const, side):
    out = dfc_matmul(
        cdf_from_c128(data), const, side, interpret=True
    )
    return cdf_to_c128(tuple(np.asarray(p) for p in out))


def test_choose_chunking_exactness_bound():
    for K in (16, 128, 512, 1024, 4096):
        bits, m = choose_chunking(K)
        assert m * K * 4 ** bits <= 2 ** 24
        assert m * bits >= 42


@pytest.mark.parametrize("shape", [(2, 32, 64, 48), (1, 64, 512, 64)])
def test_const_right(rng, shape):
    G, M, K, N = shape
    A = rng.standard_normal((G, M, K)) + 1j * rng.standard_normal(
        (G, M, K)
    )
    B = rng.standard_normal((G, K, N)) + 1j * rng.standard_normal(
        (G, K, N)
    )
    ref = np.einsum("gmk,gkn->gmn", A, B)
    got = _run(A, prechunk_const(B, K=K), "right")
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-10, rel


def test_const_left(rng):
    G, M, K, N = 2, 48, 64, 32
    A = rng.standard_normal((G, M, K)) + 1j * rng.standard_normal(
        (G, M, K)
    )
    B = rng.standard_normal((G, K, N)) + 1j * rng.standard_normal(
        (G, K, N)
    )
    ref = np.einsum("gmk,gkn->gmn", A, B)
    got = _run(B, prechunk_const(A, K=K), "left")
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-10, rel


def test_shared_const_across_batch(rng):
    G, M, K, N = 3, 32, 64, 32
    A = rng.standard_normal((G, M, K)) + 1j * rng.standard_normal(
        (G, M, K)
    )
    B = rng.standard_normal((1, K, N)) + 1j * rng.standard_normal(
        (1, K, N)
    )
    ref = np.einsum("gmk,kn->gmn", A, B[0])
    got = _run(A, prechunk_const(B, K=K), "right")
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-10, rel


def test_non_divisible_dims(rng):
    """xA-like dims (228/448 — not tile multiples) must still be exact:
    edge blocks are clipped on write, padded reads only feed clipped
    rows/cols."""
    G, M, K, N = 1, 228, 448, 228
    A = rng.standard_normal((G, M, K)) + 1j * rng.standard_normal(
        (G, M, K)
    )
    B = rng.standard_normal((G, K, N)) + 1j * rng.standard_normal(
        (G, K, N)
    )
    ref = np.einsum("gmk,gkn->gmn", A, B)
    got = _run(A, prechunk_const(B, K=K), "right")
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-10, rel
    got2 = _run(B, prechunk_const(A, K=K), "left")
    rel2 = np.max(np.abs(got2 - ref)) / np.max(np.abs(ref))
    assert rel2 < 1e-10, rel2


def test_2d_squeeze(rng):
    M, K, N = 32, 64, 48
    A = rng.standard_normal((M, K)) + 1j * rng.standard_normal((M, K))
    B = rng.standard_normal((K, N)) + 1j * rng.standard_normal((K, N))
    got = _run(A, prechunk_const(B, K=K), "right")
    assert got.shape == (M, N)
    ref = A @ B
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-10


def test_gathered_rows_const(rng):
    """Row gathers of a pre-chunked constant (the per-column DFT
    operator slices) stay exact: gathers act on the integer chunk
    planes."""
    K, N = 64, 96
    B0 = rng.standard_normal((N, K)) + 1j * rng.standard_normal((N, K))
    pc = prechunk_const(B0[None], K=K)
    rows = rng.integers(0, N, size=(2, 24))
    gpc = gather_prechunked_rows(pc, rows, transpose=True)
    # right operand [2, m, K, 24]
    A = rng.standard_normal((2, 16, K)) + 1j * rng.standard_normal(
        (2, 16, K)
    )
    ref = np.einsum("gmk,gnk->gmn", A, B0[rows][:, :, :])
    got = _run(A, gpc, "right")
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-10, rel


@pytest.mark.parametrize("inverse", [False, True])
def test_fft_pallas_matches_df_fft(rng, inverse):
    x = rng.standard_normal((2, 4, 256)) + 1j * rng.standard_normal(
        (2, 4, 256)
    )
    ref = cdf_to_c128(
        tuple(
            np.asarray(p)
            for p in df_fft_mxu(cdf_from_c128(x), inverse=inverse)
        )
    )
    got = cdf_to_c128(
        tuple(
            np.asarray(p)
            for p in df_fft_pallas(
                cdf_from_c128(x), inverse=inverse, interpret=True
            )
        )
    )
    rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    assert rel < 1e-10, rel


def test_dfc_vmem_model():
    """The tile planner fits -512 and -1k configs (shrinking tiles as
    K grows); K=2048 (xM of the -2k configs, untiled in the chunk
    scratch) cannot fit at any tiling."""
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_split import (
        _plan_tiles,
        dfc_fits_vmem,
    )

    assert dfc_fits_vmem(448, 512, 512, "left")
    assert dfc_fits_vmem(448, 512, 448, "right")
    assert dfc_fits_vmem(448, 1024, 1024, "left")
    assert not dfc_fits_vmem(448, 2048, 2048, "left")
    # larger K must shrink the streamed tile, not the 128-lane dim
    tm512, tn512 = _plan_tiles(448, 512, 512, "left")
    tm1k, tn1k = _plan_tiles(448, 1024, 1024, "left")
    assert tm1k <= tm512 and tn1k >= 64


def test_split_engine_rejects_pallas_beyond_vmem():
    """Explicit kernel='pallas' at an xM=2048 config fails fast at
    construction instead of kernel-faulting on the chip."""
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        SplitSwiftly,
    )

    params = dict(
        W=13.5625, fov=1.0, N=4096, yB_size=1536, yN_size=2048,
        xA_size=1792, xM_size=2048,
    )
    config = SwiftlyConfig(**params)
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    with pytest.raises(ValueError, match="VMEM"):
        SplitSwiftly(config._core, fc, sc, kernel="pallas")


def test_split_engine_mesh_matches_single_device():
    """The mesh-sharded split tier (facet/batch sharding, exact
    all_gather + two-sum facet reduction, all_to_all backward) stays in
    the same f64-class accuracy band as the single-device engine —
    including facet padding (F=9 on 4 devices -> F_pad=12)."""
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_facet,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        SplitSwiftly,
        make_tile_mesh,
    )

    params = dict(
        W=13.5625, fov=1.0, N=256, yB_size=96, yN_size=128,
        xA_size=96, xM_size=128,
    )
    config = SwiftlyConfig(**params)
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    facets = [
        make_facet(config.image_size, cfg, [(1, 1, 0)]) for cfg in fc
    ]
    eng = SplitSwiftly(
        config._core, fc, sc, kernel="xla", mesh=make_tile_mesh(4)
    )
    assert eng.F_pad == 12
    out, n = eng.roundtrip(facets)
    assert n == len(sc)
    errs = [
        float(np.sqrt(np.mean(
            np.abs(out[i] - np.asarray(facets[i])) ** 2
        )))
        for i in range(len(fc))
    ]
    # same truncation-floor band as the single-device engine (2.26e-9
    # measured for both at this tiny config)
    assert max(errs) < 5e-9, errs


def test_split_engine_mesh_pallas_kernel():
    """The fused kernel on a mesh: facet-leading pre-chunked operands
    shard with the facets (global power-of-two scales keep local
    shards exact), the cross-shard reduction is the same two-sum
    ladder as the XLA-kernel mesh mode. Accuracy must stay in the
    single-device fused kernel's truncation-floor band."""
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_facet,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        SplitSwiftly,
        make_tile_mesh,
    )

    params = dict(
        W=13.5625, fov=1.0, N=256, yB_size=96, yN_size=128,
        xA_size=96, xM_size=128,
    )
    config = SwiftlyConfig(**params)
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    facets = [
        make_facet(config.image_size, cfg, [(1, 1, 0)]) for cfg in fc
    ]
    eng = SplitSwiftly(config._core, fc, sc, kernel="pallas",
                       mesh=make_tile_mesh(4))
    assert eng.kernel == "pallas"
    out, n = eng.roundtrip(facets)
    assert n == len(sc)
    errs = [
        float(np.sqrt(np.mean(
            np.abs(out[i] - np.asarray(facets[i])) ** 2
        )))
        for i in range(len(fc))
    ]
    assert max(errs) < 5e-9, errs


def test_split_engine_kernel_mode_matches_xla():
    """The split engine's kernel mode reaches the same accuracy class
    as the XLA formulation against the point-source oracle (the two
    42-bit truncation schemes differ in their noise floors, so the
    comparison is each-vs-oracle, not mode-vs-mode; both measure
    2.26e-9 max at this tiny config, where the truncation floor
    dominates)."""
    from ska_sdp_distributed_fourier_transform_tpu import (
        SwiftlyConfig,
        make_facet,
        make_full_facet_cover,
        make_full_subgrid_cover,
    )
    from ska_sdp_distributed_fourier_transform_tpu.parallel import (
        SplitSwiftly,
    )

    params = dict(
        W=13.5625, fov=1.0, N=256, yB_size=96, yN_size=128,
        xA_size=96, xM_size=128,
    )
    config = SwiftlyConfig(**params)
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    facets = [
        make_facet(config.image_size, cfg, [(1, 1, 0)]) for cfg in fc
    ]
    out_x, _ = SplitSwiftly(
        config._core, fc, sc, kernel="xla"
    ).roundtrip(facets)
    out_p, _ = SplitSwiftly(
        config._core, fc, sc, kernel="pallas"
    ).roundtrip(facets)
    for mode_out in (out_x, out_p):
        errs = [
            float(np.sqrt(np.mean(
                np.abs(mode_out[i] - np.asarray(facets[i])) ** 2
            )))
            for i in range(len(fc))
        ]
        assert max(errs) < 5e-9, errs
