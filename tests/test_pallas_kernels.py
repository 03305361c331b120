"""Interpret-mode tests for the Pallas TPU kernels.

The kernels run compiled on TPU; on the CPU test platform they run under
the Pallas interpreter with identical semantics (the reference's
dual-backend pattern applied to kernels).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_kernels import (
    cmatmul,
    fused_sandwich,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _crand(rng, shape):
    return (rng.normal(size=shape) + 1j * rng.normal(size=shape)).astype(
        np.complex64
    )


@pytest.mark.parametrize("shape", [(256, 128, 192), (128, 256, 128)])
def test_cmatmul_matches_numpy(rng, shape):
    M, K, N = shape
    A = _crand(rng, (M, K))
    B = _crand(rng, (K, N))
    got = np.asarray(cmatmul(jnp.asarray(A), jnp.asarray(B),
                             interpret=True))
    want = A @ B
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_cmatmul_accepts_float_pairs(rng):
    A = _crand(rng, (128, 128))
    B = _crand(rng, (128, 128))
    got = np.asarray(
        cmatmul(
            (jnp.asarray(A.real), jnp.asarray(A.imag)),
            (jnp.asarray(B.real), jnp.asarray(B.imag)),
            interpret=True,
        )
    )
    want = A @ B
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-5


@pytest.mark.parametrize("F,B,xM,c", [(3, 2, 128, 64), (1, 1, 128, 128)])
def test_fused_sandwich_matches_einsum(rng, F, B, xM, c):
    A0 = _crand(rng, (F, xM, c))
    A1 = _crand(rng, (F, xM, c))
    X = _crand(rng, (B, F, c, c))
    got = np.asarray(
        fused_sandwich(jnp.asarray(A0), jnp.asarray(X), jnp.asarray(A1),
                       interpret=True)
    )
    want = np.einsum("fqk,bfkl,frl->bqr", A0, X, A1)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-5


def test_fused_sandwich_is_engine_contraction(rng):
    """The kernel computes exactly the forward engine's hot contraction
    (add_to_subgrid_2d summed over facets) when fed the real operator
    matrices."""
    from ska_sdp_distributed_fourier_transform_tpu.ops import (
        operators as linop,
    )
    from ska_sdp_distributed_fourier_transform_tpu.ops.core import (
        SwiftlyCore,
    )

    W, N, YN, XM = 13.5625, 1024, 512, 256
    core = SwiftlyCore(W, N, XM, YN)
    m = core.xM_yN_size
    Fn = np.asarray(core._Fn)
    offs = [(0, 0), (256, 0), (0, 256)]
    A0 = np.stack([
        linop.add_to_subgrid_operator(N, XM, m, Fn, o0) for o0, _ in offs
    ]).astype(np.complex64)
    A1 = np.stack([
        linop.add_to_subgrid_operator(N, XM, m, Fn, o1) for _, o1 in offs
    ]).astype(np.complex64)
    X = _crand(rng, (2, len(offs), m, m))

    got = np.asarray(
        fused_sandwich(jnp.asarray(A0), jnp.asarray(X), jnp.asarray(A1),
                       interpret=True)
    )
    want = np.zeros((2, XM, XM), dtype=np.complex64)
    for b in range(2):
        for f, (o0, o1) in enumerate(offs):
            want[b] += np.asarray(
                core.add_to_subgrid_2d(X[b, f].astype(complex), o0, o1)
            ).astype(np.complex64)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-4


def test_fused_lr_sandwich_matches_einsum(rng):
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_kernels import (
        fused_lr_sandwich,
    )

    p, q, r, s, B = 112, 128, 128, 112, 3
    L = _crand(rng, (p, q))
    M = _crand(rng, (B, q, r))
    R = _crand(rng, (B, s, r))
    got = np.asarray(
        fused_lr_sandwich(jnp.asarray(L), jnp.asarray(M), jnp.asarray(R),
                          interpret=True)
    )
    want = np.einsum("pq,bqr,bsr->bps", L, M, R)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-4


def test_fused_lr_sandwich_is_finish_subgrid(rng):
    """Fed gathered inverse-DFT rows, the kernel computes exactly the
    forward engine's finish_subgrid sandwich."""
    from ska_sdp_distributed_fourier_transform_tpu.ops import (
        operators as linop,
    )
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_kernels import (
        fused_lr_sandwich,
    )

    xM, xA, B = 256, 228, 2
    Fi = linop.shifted_idft_matrix(xM).astype(np.complex64)
    base = xM // 2 - xA // 2 + np.arange(xA)
    off0 = 16
    off1s = [0, 32]
    G0 = Fi[(base + off0) % xM]
    G1 = np.stack([Fi[(base + o1) % xM] for o1 in off1s])
    S = _crand(rng, (B, xM, xM))
    got = np.asarray(
        fused_lr_sandwich(jnp.asarray(G0), jnp.asarray(S),
                          jnp.asarray(G1), interpret=True)
    )
    want = np.einsum("qk,bkl,brl->bqr", G0, S, G1)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 1e-4


@pytest.mark.parametrize("form", ["tt", "ls", "bd"])
@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_pallas_forms_match_fft_mxu(rng, form, inverse):
    """Both tile formulations (per-stage transpose and leading-swap)
    reproduce the XLA-level four-step transform to the kernel's 3-pass
    bf16-split accuracy class, including the fused output phase."""
    from ska_sdp_distributed_fourier_transform_tpu.ops.fft_mxu import (
        fft_mxu,
    )
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_fft import (
        four_step_pallas,
    )

    n = 512
    x = _crand(rng, (3, 48, n))
    phase = np.exp(1j * rng.normal(size=(3, n))).astype(np.complex64)
    got = four_step_pallas(
        jnp.asarray(x), inverse=inverse, phase=jnp.asarray(phase),
        interpret=True, form=form,
    )
    want = fft_mxu(jnp.asarray(x), inverse=inverse)
    want = want * jnp.asarray(phase)[:, None, :]
    rel = float(jnp.max(jnp.abs(got - want))) / float(
        jnp.max(jnp.abs(want))
    )
    assert rel < 5e-5


@pytest.mark.parametrize("inverse", [False, True])
def test_four_step_pallas_bd_permuted(rng, inverse):
    """The bd tile's permuted output is the natural-order transform
    under the documented index map (loc = (p % n1)*n2 + p//n1), with
    the fused phase laid out to match."""
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_fft import (
        _plan_pair,
        four_step_pallas,
        permute_positions,
    )

    n = 512
    n1, n2 = _plan_pair(n, inverse, "bd")[:2]
    x = _crand(rng, (2, 24, n))
    phase = np.exp(1j * rng.normal(size=(2, n))).astype(np.complex64)
    perm = four_step_pallas(
        jnp.asarray(x), inverse=inverse, phase=jnp.asarray(phase),
        interpret=True, form="bd", permuted=True,
    )
    nat = four_step_pallas(
        jnp.asarray(x), inverse=inverse, phase=jnp.asarray(phase),
        interpret=True, form="bd",
    )
    loc = permute_positions(np.arange(n), n1, n2)
    np.testing.assert_allclose(
        np.asarray(perm)[..., loc], np.asarray(nat), rtol=0, atol=1e-5
    )


def test_fused_finish_rows_bd_matches_tt(rng, monkeypatch):
    """fused_finish_rows under SWIFTLY_FFT_FORM=bd (permuted transform
    + permuted gather indices) matches the tt path."""
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_fft import (
        fused_finish_rows,
    )

    n, yB = 512, 320
    x = _crand(rng, (3, 24, n))
    fb = rng.normal(size=(yB,)).astype(np.float32)
    offs = np.asarray([0, 64, -96], np.int32)
    masks = (rng.uniform(size=(3, yB)) > 0.1).astype(np.float32)

    monkeypatch.setenv("SWIFTLY_FFT_FORM", "tt")
    want = np.asarray(fused_finish_rows(
        jnp.asarray(x), fb, jnp.asarray(offs), masks, yB, interpret=True
    ))
    monkeypatch.setenv("SWIFTLY_FFT_FORM", "bd")
    got = np.asarray(fused_finish_rows(
        jnp.asarray(x), fb, jnp.asarray(offs), masks, yB, interpret=True
    ))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 5e-5


@pytest.mark.parametrize("yB_blocks", ["aligned", "misaligned"])
def test_fused_prepare_rows_bd_matches_tt(rng, monkeypatch, yB_blocks):
    """fused_prepare_rows under SWIFTLY_FFT_FORM=bd — fused window+pad
    in the kernel's input DMA when the geometry is n2-aligned, padded
    fallback otherwise — matches the tt path."""
    from ska_sdp_distributed_fourier_transform_tpu.ops.pallas_fft import (
        _plan_pair,
        fused_prepare_rows,
        pad_spec_aligned,
    )

    n = 512
    n2 = _plan_pair(n, True, "bd")[1]
    # bd plans now force a lane-aligned minor factor (n2=128 at n=512:
    # 4x128), so derive a geometry that is valid for ANY plan: the
    # aligned case needs both yB and lo = (n - yB)/2 to be n2-multiples
    yB = n - 2 * n2 if yB_blocks == "aligned" else n - 2 * n2 - 8
    lo = n // 2 - yB // 2
    assert pad_spec_aligned(n, lo, yB, True) == (yB_blocks == "aligned")
    x = _crand(rng, (3, 24, yB))
    fb = rng.normal(size=(yB,)).astype(np.float32)
    phase = np.exp(1j * rng.normal(size=(3, n))).astype(np.complex64)

    monkeypatch.setenv("SWIFTLY_FFT_FORM", "tt")
    want = np.asarray(fused_prepare_rows(
        jnp.asarray(x), fb, jnp.asarray(phase), n, interpret=True
    ))
    monkeypatch.setenv("SWIFTLY_FFT_FORM", "bd")
    got = np.asarray(fused_prepare_rows(
        jnp.asarray(x), fb, jnp.asarray(phase), n, interpret=True
    ))
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 5e-5
