"""Split-precision (double-f32 / exact-chunked MXU) arithmetic tests.

The ``precision="split"`` tier must deliver f64-class products from
bf16/f32 hardware ops; these tests pin the building blocks against
numpy float64 and the full round trip against the reference accuracy
class (reference tests/test_api.py:125 reaches <3e-10 only in
complex128 — the split tier reaches it with f32 planes).
"""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.ops import (
    split_precision as sp,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_df_roundtrip_exact(rng):
    x = rng.normal(size=(64,)) * np.exp(rng.normal(size=(64,)) * 3)
    got = sp.df_to_f64(sp.df_from_f64(x))
    # (hi, lo) captures ~48 bits of the f64 mantissa
    assert np.max(np.abs(got - x)) / np.max(np.abs(x)) < 2**-46


def test_df_mul_accuracy(rng):
    a = rng.normal(size=(128,))
    b = rng.normal(size=(128,))
    got = sp.df_to_f64(sp.df_mul(sp.df_from_f64(a), sp.df_from_f64(b)))
    assert np.max(np.abs(got - a * b)) < 1e-13 * np.max(np.abs(a * b))


@pytest.mark.parametrize("keep,n_chunks,bound", [
    (5, 6, 1e-10),   # the default tier: 42-bit operands, 21 dots
    (6, 7, 1e-11),   # full double-float
])
def test_chunked_matmul_accuracy(rng, keep, n_chunks, bound):
    M = K = N = 192
    A = rng.normal(size=(M, K)) * np.exp(rng.normal(size=(M, K)))
    B = rng.normal(size=(K, N))
    got = sp.df_to_f64(
        sp.df_matmul(sp.df_from_f64(A), sp.df_from_f64(B),
                     keep=keep, n_chunks=n_chunks)
    )
    ref = A @ B
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < bound


def test_chunked_cmatmul_accuracy(rng):
    M = K = N = 128
    A = rng.normal(size=(M, K)) + 1j * rng.normal(size=(M, K))
    B = rng.normal(size=(K, N)) + 1j * rng.normal(size=(K, N))
    got = sp.cdf_to_c128(
        sp.df_cmatmul(sp.cdf_from_c128(A), sp.cdf_from_c128(B))
    )
    ref = A @ B
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


@pytest.mark.parametrize("inverse", [False, True])
def test_df_fft_matches_shifted_fft(rng, inverse):
    x = rng.normal(size=(3, 512)) + 1j * rng.normal(size=(3, 512))
    got = sp.cdf_to_c128(
        sp.df_fft_mxu(sp.cdf_from_c128(x), inverse=inverse,
                      keep=6, n_chunks=7)
    )
    fn = np.fft.ifft if inverse else np.fft.fft
    ref = np.fft.fftshift(
        fn(np.fft.ifftshift(x, axes=-1), axis=-1), axes=-1
    )
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


def test_split_roundtrip_reference_class():
    """Full split-precision round trip: f32-plane arithmetic reaching
    the complex128 accuracy class. The measured complex128 floor of
    this exact configuration is 1.05e-9 (the reference's 3e-10 bound,
    reference tests/test_api.py:125, is for the N=1024 canonical
    parameters — the split engine matches the c128 floor to <2x at the
    N=256 dryrun config: 5.17e-10 vs 5.02e-10); the assertion allows
    2x the c128 floor."""
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
        W=13.5625, fov=1.0, N=512, yB_size=192, yN_size=256,
        xA_size=192, xM_size=256,
    )
    config = SwiftlyConfig(**params)
    fc = make_full_facet_cover(config)
    sc = make_full_subgrid_cover(config)
    eng = SplitSwiftly(config._core, fc, sc)
    facets = [
        make_facet(config.image_size, cfg, [(1, 1, 0)]) for cfg in fc
    ]
    out, n = eng.roundtrip(facets)
    assert n == len(sc)
    errs = [
        float(np.sqrt(np.mean(np.abs(out[i] - np.asarray(facets[i])) ** 2)))
        for i in range(len(fc))
    ]
    assert max(errs) < 2e-9, errs  # 2x the measured c128 floor
