"""Tests for the four-step MXU FFT (shifted convention via folded
factor-matrix permutations)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ska_sdp_distributed_fourier_transform_tpu.ops.fft_mxu import (
    factor_pair,
    fft_mxu,
)


@pytest.mark.parametrize("n", [8192, 4096, 2048, 512, 128, 96])
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_shifted_fft(n, inverse):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
    np_fn = np.fft.ifft if inverse else np.fft.fft
    want = np.fft.fftshift(
        np_fn(np.fft.ifftshift(x, axes=1), axis=1), axes=1
    )
    got = np.asarray(fft_mxu(jnp.asarray(x), inverse=inverse))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_factor_pairs_even():
    for n in (8192, 4096, 512, 96):
        n1, n2 = factor_pair(n)
        assert n1 * n2 == n and n1 % 2 == 0 and n2 % 2 == 0


@pytest.mark.parametrize("n", [6, 7])
def test_fallback_sizes(n):
    """Sizes without an even-even factorisation fall back to jnp.fft."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, n)) + 1j * rng.normal(size=(2, n))
    want = np.fft.fftshift(
        np.fft.fft(np.fft.ifftshift(x, axes=1), axis=1), axes=1
    )
    np.testing.assert_allclose(
        np.asarray(fft_mxu(jnp.asarray(x))), want, atol=1e-10
    )
