"""Four-step FFT on the MXU: factor-matrix DFTs instead of an FFT call.

XLA's TPU FFT runs on the VPU at a few hundred GFLOP/s; for the sizes
SwiFTly transforms (yN up to 64k, always highly composite), the
Cooley-Tukey four-step factorisation turns the transform into two batched
*matmuls* against small DFT factor matrices plus one twiddle multiply —
work the MXU executes at tens of TFLOP/s. With n = N1·N2:

    x[a·N2 + b]                                  reshape to [N1, N2]
    T1[c, b]  = sum_a F1[c, a] · x[a, b]         DFT_N1 (matmul over a)
    T2[c, b]  = T1[c, b] · W[c, b]               twiddles e^{-2πi cb/n}
    X[c + N1·d] = sum_b F2[d, b] · T2[c, b]      DFT_N2 (matmul over b)

SwiFTly's centre-zero ("fftshift") convention folds entirely into the
constants: the input ifftshift is a cyclic shift of the `a` digit
(absorbed as a column permutation of F1, exact when N2 | n/2), the output
fftshift a cyclic shift of the `d` digit (row permutation of F2).

The factor matrices are tiny ([N1,N1] + [N2,N2], ≤ 256² each for every
catalogue size) and shared across the batch, so arithmetic intensity is
high and precision is the MXU 3-pass bf16 ("high") by default.

Measured on a v5e at the engine's column shapes ([2304, 8192] c64):
~1.4x the raw XLA FFT call. Not wired into the engine by default — the
stream's FFT-chain cost is dominated by the window/pad/phase fusions
*around* the transform (which both implementations need), so the
end-to-end gain is negligible there; this module is the building block
for hardware where the VPU:MXU ratio is leaner (v5p/v4) or for
standalone spectral work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["factor_pair", "fft_mxu_plan", "fft_mxu"]


def factor_pair(n: int, min_n2: int = 1):
    """Split ``n = N1 · N2`` with both factors as close as possible (and
    N2 | n/2 so the shift convention folds into the constants). Returns
    None when ``n`` has no suitable factorisation (e.g. primes).

    :param min_n2: require ``N2 >= min_n2`` (pushes N1 down). The bd
        Pallas tile needs a lane-aligned minor factor: Mosaic rejects
        its in-register ``[.., n1, n2] -> [.., n]`` shape cast when
        ``n2`` is below the 128-lane width (measured on v5e at
        yN=4096: n2=64 -> "infer-vector-layout: unsupported shape
        cast"; n2=128 compiles). min_n2=128 re-factors 4096 as 32x128.
    """
    best = None
    for n1 in range(int(np.sqrt(n)), 1, -1):
        if n % n1 == 0:
            n2 = n // n1
            if n2 < min_n2:
                continue
            if (n // 2) % n2 == 0 and (n // 2) % n1 == 0:
                best = (n1, n2)
                break
    return best


@functools.lru_cache(maxsize=None)
def fft_mxu_plan(n: int, inverse: bool = False, min_n2: int = 1):
    """Precompute the (F1, W, F2) constants of the shifted four-step
    transform of length ``n`` (host-side float64 numpy; cached)."""
    pair = factor_pair(n, min_n2)
    if pair is None:
        return None
    N1, N2 = pair
    sign = 1j if inverse else -1j

    a = np.arange(N1)
    b = np.arange(N2)
    c = np.arange(N1)
    d = np.arange(N2)

    # F1[c, a] = e^{sign·2π i a c / N1}, with the input ifftshift folded
    # in: x was rolled by -(n//2) ⇒ a-digit shifted by N1/2 (exact since
    # N2 | n/2), i.e. use column (a + N1/2) mod N1.
    F1 = np.exp(sign * 2 * np.pi * np.outer(c, (a + N1 // 2) % N1) / N1)
    # Twiddles W[c, b] = e^{sign·2π i c b / n}
    W = np.exp(sign * 2 * np.pi * np.outer(c, b) / n)
    # F2[d, b] = e^{sign·2π i b d / N2}, with the output fftshift folded
    # in: row (d + N2/2) mod N2.
    F2 = np.exp(sign * 2 * np.pi * np.outer((d + N2 // 2) % N2, b) / N2)
    if inverse:
        F2 = F2 / n
    return N1, N2, F1, W, F2


def fft_mxu(x, inverse=False, precision=None, constants=None):
    """Centre-zero FFT along the LAST axis via MXU factor matmuls.

    Matches ``primitives.fft`` / ``primitives.ifft`` semantics
    (``fftshift ∘ (i)FFT ∘ ifftshift``) for even ``n`` with a suitable
    factorisation; falls back to ``jnp.fft`` otherwise.

    :param x: complex array [..., n]
    :param inverse: inverse transform (includes the 1/n scale)
    :param precision: matmul precision (default HIGH)
    :param constants: optional pre-converted (N1, N2, F1, W, F2) device
        constants (from :func:`fft_mxu_plan`, cast to x.dtype)
    :return: transformed array, same shape/dtype
    """
    n = x.shape[-1]
    plan = constants if constants is not None else fft_mxu_plan(n, inverse)
    if plan is None or n % 2:
        fn = jnp.fft.ifft if inverse else jnp.fft.fft
        return jnp.fft.fftshift(
            fn(jnp.fft.ifftshift(x, axes=-1), axis=-1), axes=-1
        )
    N1, N2, F1, W, F2 = plan
    F1 = jnp.asarray(F1, dtype=x.dtype)
    W = jnp.asarray(W, dtype=x.dtype)
    F2 = jnp.asarray(F2, dtype=x.dtype)
    prec = precision or jax.lax.Precision.HIGH

    lead = x.shape[:-1]
    xr = x.reshape(lead + (N1, N2))
    t1 = jnp.einsum("ca,...ab->...cb", F1, xr, precision=prec)
    t2 = t1 * W
    out = jnp.einsum("db,...cb->...dc", F2, t2, precision=prec)
    return out.reshape(lead + (n,))
