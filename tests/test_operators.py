"""Unit tests for the dense-operator (MXU) formulation of the SwiFTly ops.

Each operator matrix must reproduce the corresponding FFT-path op exactly
(to rounding) for aligned, negative and wrapping offsets, and odd sizes.
"""

import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.ops import operators as op
from ska_sdp_distributed_fourier_transform_tpu.ops.core import SwiftlyCore

W, N, YB, YN, XA, XM = 13.5625, 1024, 416, 512, 228, 256


@pytest.fixture(scope="module")
def core():
    return SwiftlyCore(W, N, XM, YN)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(5)


def test_shifted_dft_matrices_match_fft(rng):
    for n in (8, 9, 128):
        x = rng.normal(size=n) + 1j * rng.normal(size=n)
        want = np.fft.fftshift(np.fft.fft(np.fft.ifftshift(x)))
        np.testing.assert_allclose(
            op.shifted_dft_matrix(n) @ x, want, atol=1e-11
        )
        wanti = np.fft.fftshift(np.fft.ifft(np.fft.ifftshift(x)))
        np.testing.assert_allclose(
            op.shifted_idft_matrix(n) @ x, wanti, atol=1e-13
        )


@pytest.mark.parametrize("off", [0, 4, -8, 16, N - 4])
def test_add_to_subgrid_operator(core, rng, off):
    m = core.xM_yN_size
    x = rng.normal(size=m) + 1j * rng.normal(size=m)
    A = op.add_to_subgrid_operator(N, XM, m, np.asarray(core._Fn), off)
    np.testing.assert_allclose(
        A @ x, np.asarray(core.add_to_subgrid(x, off, axis=0)), atol=1e-12
    )


@pytest.mark.parametrize("off", [0, 4, -8, N - 4])
def test_extract_from_subgrid_operator(core, rng, off):
    m = core.xM_yN_size
    fs = rng.normal(size=XM) + 1j * rng.normal(size=XM)
    E = op.extract_from_subgrid_operator(N, XM, m, np.asarray(core._Fn),
                                         off)
    np.testing.assert_allclose(
        E @ fs, np.asarray(core.extract_from_subgrid(fs, off, axis=0)),
        atol=1e-12,
    )


@pytest.mark.parametrize("off", [0, 3, -5])
@pytest.mark.parametrize("xA", [XA, XA - 1])
def test_finish_and_prepare_subgrid_operators(core, rng, off, xA):
    fs = rng.normal(size=XM) + 1j * rng.normal(size=XM)
    F = op.finish_subgrid_operator(XM, xA, off)
    np.testing.assert_allclose(
        F @ fs, np.asarray(core.finish_subgrid(fs, [off], xA)), atol=1e-12
    )
    sg = rng.normal(size=xA) + 1j * rng.normal(size=xA)
    P = op.prepare_subgrid_operator(XM, xA, off)
    np.testing.assert_allclose(
        P @ sg, np.asarray(core.prepare_subgrid(sg, [off])), atol=1e-11
    )


@pytest.mark.parametrize("off", [0, 128, -256])
@pytest.mark.parametrize("yB", [YB, YB - 1])
def test_facet_operators(core, rng, off, yB):
    Fb = np.asarray(core._Fb)
    f = rng.normal(size=yB) + 1j * rng.normal(size=yB)
    Pf = op.prepare_facet_operator(N, YN, Fb, yB, off)
    np.testing.assert_allclose(
        Pf @ f, np.asarray(core.prepare_facet(f, off, axis=0)), atol=1e-9
    )
    acc = rng.normal(size=YN) + 1j * rng.normal(size=YN)
    Fc = op.finish_facet_operator(N, YN, Fb, yB, off)
    np.testing.assert_allclose(
        Fc @ acc, np.asarray(core.finish_facet(acc, off, yB, axis=0)),
        atol=1e-7,  # Fb amplifies edge-sample rounding
    )


def test_two_axis_sandwich(core, rng):
    """2-D op == Op0 @ X @ Op1ᵀ — the contraction shape the engine uses."""
    m = core.xM_yN_size
    X = rng.normal(size=(m, m)) + 1j * rng.normal(size=(m, m))
    Fn = np.asarray(core._Fn)
    A0 = op.add_to_subgrid_operator(N, XM, m, Fn, 4)
    A1 = op.add_to_subgrid_operator(N, XM, m, Fn, -8)
    want = np.asarray(core.add_to_subgrid_2d(X, 4, -8))
    np.testing.assert_allclose(A0 @ X @ A1.T, want, atol=1e-11)
