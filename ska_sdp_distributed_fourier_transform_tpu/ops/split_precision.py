"""Extended-precision (double-float32) arithmetic on bf16/MXU hardware.

The TPU has no fast f64 path, so the engine's default accuracy is
complex64-class (~3e-7 round-trip RMSE). This module provides the
``precision="split"`` tier: every value is carried as an (hi, lo) f32
pair (~48-bit mantissa), and matrix products are computed **exactly** by
integer chunking (an Ozaki-scheme variant adapted to the TPU MXU):

* each operand (normalised by a power-of-two scale) is sliced into
  ``m`` integer-valued chunks of ``b`` bits; integers up to 2^b are
  exactly representable in bf16, the MXU multiplies them exactly
  (products <= 2^{2b}), and the f32 accumulator adds them **without
  rounding** as long as ``K * 2^{2b} <= 2^24`` — so every chunk-pair
  dot is exact integer arithmetic executed at full MXU speed;
* chunk-pair dots with significance below the target precision are
  dropped (i+j <= keep), giving ~`keep*(keep+1)/2` bf16 passes — e.g.
  45-bit products cost ~15 passes vs the default engine's 9
  (3 Karatsuba products x 3-pass bf16) — a ~1.7x MXU-time premium for
  ~2^-45 relative error instead of ~sqrt(K)*2^-24;
* the exact integer partial dots are recombined on the VPU with
  two-sum ladders into an (hi, lo) result.

The reference meets its 3e-10 round-trip bound only in complex128 on
CPU (reference tests/test_api.py:125); this tier brings the TPU fast
path into that accuracy class without leaving bf16/f32 hardware.

All public helpers treat a "df32 array" as a ``(hi, lo)`` tuple of
equal-shape float32 jax arrays, and a "complex df32" as a
``(re_hi, re_lo, im_hi, im_lo)`` 4-tuple.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "df_from_f64",
    "df_to_f64",
    "df_add",
    "df_mul",
    "df_cmul",
    "df_matmul",
    "df_cmatmul",
    "cdf_from_c128",
    "cdf_to_c128",
]

# Chunking parameters: b bits per integer chunk, m chunks per operand,
# keep chunk-pair diagonals with i + j <= KEEP (0-indexed). With b=7:
# operand mantissa 7*m bits; product exact; diagonals beyond KEEP are
# below 2^-(7*(KEEP+2)) of the leading term.
CHUNK_BITS = 7
N_CHUNKS = 7
KEEP = 6  # i + j <= 6  ->  products good to ~2^-56 relative


# --------------------------------------------------------------- df32 core


def _two_sum(a, b):
    """Knuth two-sum: s + e == a + b exactly (6 flops, branch-free)."""
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _quick_two_sum(a, b):
    """Dekker fast-two-sum; requires |a| >= |b| (3 flops)."""
    s = a + b
    e = b - (s - a)
    return s, e


def df_from_f64(x):
    """Split a host float64 array into an exact (hi, lo) f32 pair."""
    x = np.asarray(x, dtype=np.float64)
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def df_to_f64(df):
    """Recombine an (hi, lo) pair into host float64."""
    hi, lo = df
    return np.asarray(hi, dtype=np.float64) + np.asarray(
        lo, dtype=np.float64
    )


def cdf_from_c128(z):
    """Split a host complex128 array into (re_hi, re_lo, im_hi, im_lo)."""
    z = np.asarray(z, dtype=np.complex128)
    return df_from_f64(z.real) + df_from_f64(z.imag)


def cdf_to_c128(cdf):
    """Recombine a complex df32 4-tuple into host complex128."""
    rh, rl, ih, il = cdf
    return df_to_f64((rh, rl)) + 1j * df_to_f64((ih, il))


def df_add(x, y):
    """(hi, lo) + (hi, lo), ~IEEE double-float addition (11 flops)."""
    xh, xl = x
    yh, yl = y
    s, e = _two_sum(xh, yh)
    e = e + (xl + yl)
    return _quick_two_sum(s, e)


def _split_f32(a):
    """Dekker split of f32 into two non-overlapping 12-bit halves."""
    c = jnp.float32(4097.0) * a  # 2^12 + 1
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def _two_prod(a, b):
    """Exact f32 product: p + e == a * b (Dekker, no FMA needed)."""
    p = a * b
    ah, al = _split_f32(a)
    bh, bl = _split_f32(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_mul(x, y):
    """(hi, lo) * (hi, lo) elementwise (~25 flops)."""
    xh, xl = x
    yh, yl = y
    p, e = _two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return _quick_two_sum(p, e)


def df_cmul(x, y):
    """Complex df32 elementwise product (Karatsuba-free, 4 df_mul)."""
    xrh, xrl, xih, xil = x
    yrh, yrl, yih, yil = y
    rr = df_mul((xrh, xrl), (yrh, yrl))
    ii = df_mul((xih, xil), (yih, yil))
    ri = df_mul((xrh, xrl), (yih, yil))
    ir = df_mul((xih, xil), (yrh, yrl))
    re = df_add(rr, (-ii[0], -ii[1]))
    im = df_add(ri, ir)
    return re + im


# ------------------------------------------------------- integer chunking


def _chunk(df, n_chunks=N_CHUNKS, bits=CHUNK_BITS):
    """Slice a df32 array into integer-valued bf16 chunks.

    Returns ``(chunks [n_chunks, ...] bf16, scale f32 scalar)`` with
    ``value ~= scale * sum_i chunks[i] * 2^{-bits*(i+1)}`` and every
    chunk an integer in [-2^bits, 2^bits] (exact in bf16).
    """
    hi, lo = df
    amax = jnp.max(jnp.abs(hi))
    # power-of-two scale so the normalised value sits in [-1, 1].
    # ldexp, NOT jnp.exp2: exp2 lowers to exp(x*ln2) whose result is not
    # an exact power of two (e.g. exp2(-13) != 2^-13 on XLA CPU), which
    # silently breaks the "scaling is exact" invariant underneath the
    # whole chunking scheme.
    k = jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30))).astype(jnp.int32)
    scale = jnp.ldexp(jnp.float32(1.0), k)
    inv = jnp.ldexp(jnp.float32(1.0), -k)
    rh = hi * inv  # exact (power-of-two scaling)
    rl = lo * inv
    mul = jnp.float32(2.0**bits)
    chunks = []
    for _ in range(n_chunks):
        rh = rh * mul  # exact
        rl = rl * mul
        c = jnp.round(rh)
        rh = rh - c  # exact (Sterbenz: c within a factor 2 of rh)
        # fold the low word in once the high residual has shrunk enough
        # that the sum stays exact; adding every round is safe because
        # |rh| <= 0.5 and |rl| <= 2^-24-ish of the original
        rh, rl = _two_sum(rh, rl)
        chunks.append(c.astype(jnp.bfloat16))
    return jnp.stack(chunks), scale


@functools.partial(jax.jit, static_argnames=("keep",))
def _chunk_matmul(ac, asc, bc, bsc, keep):
    """Exact chunked real matmul core.

    ``ac`` [m, M, K] integer bf16 chunks, ``bc`` [m, K, N]; returns the
    df32 product. Every chunk-pair dot is exact (integer bf16 products,
    f32 accumulation without rounding for K*2^{2b} <= 2^24); diagonals
    are combined by exact two-sum ladders.
    """
    m = ac.shape[0]
    # exact integer dots for kept (i, j) pairs, grouped by diagonal
    diags = {}
    for i in range(m):
        for j in range(m):
            if i + j > keep:
                continue
            d = jnp.dot(
                ac[i], bc[j], preferred_element_type=jnp.float32
            )
            diags.setdefault(i + j, []).append(d)

    # combine: within a diagonal the dots share a weight; sums can
    # exceed 2^24 so use two-sum chains to keep the error term
    hi = jnp.zeros_like(diags[0][0])
    lo = jnp.zeros_like(hi)
    w = jnp.float32(2.0 ** (-2 * CHUNK_BITS))
    for dlev in sorted(diags):
        s = jnp.zeros_like(hi)
        e = jnp.zeros_like(hi)
        for term in diags[dlev]:
            s, e1 = _two_sum(s, term)
            e = e + e1
        wd = w * jnp.float32(2.0 ** (-CHUNK_BITS * dlev))
        # scaled add into (hi, lo): scaling by power of two is exact
        hi, e2 = _two_sum(hi, s * wd)
        lo = lo + e2 + e * wd
    hi, lo = _quick_two_sum(hi, lo)
    scale = asc * bsc
    return hi * scale, lo * scale


def df_matmul(a, b, keep=KEEP, n_chunks=N_CHUNKS):
    """Exact-product real matmul of df32 operands.

    :param a: (hi, lo) f32 pair, shape [..., M, K]
    :param b: (hi, lo) f32 pair, shape [..., K, N]
    :return: (hi, lo) f32 pair [..., M, N], relative error ~2^{-7(keep+2)}
    """
    ac, asc = _chunk(a, n_chunks)
    bc, bsc = _chunk(b, n_chunks)
    if ac.ndim > 3:
        # batch dims: move chunk axis innermost via vmap over batches
        batch = ac.shape[1:-2]
        flat_a = ac.reshape((ac.shape[0], -1) + ac.shape[-2:])
        flat_b = bc.reshape((bc.shape[0], -1) + bc.shape[-2:])
        outs = jax.vmap(
            lambda x, y: _chunk_matmul(x, asc, y, bsc, keep),
            in_axes=(1, 1), out_axes=0,
        )(flat_a, flat_b)
        hi = outs[0].reshape(batch + outs[0].shape[-2:])
        lo = outs[1].reshape(batch + outs[1].shape[-2:])
        return hi, lo
    return _chunk_matmul(ac, asc, bc, bsc, keep)


def df_cmatmul(a, b, keep=KEEP, n_chunks=N_CHUNKS):
    """Complex matmul of complex df32 operands (3 real chunked matmuls,
    Karatsuba).

    :param a: (re_hi, re_lo, im_hi, im_lo), shape [..., M, K]
    :param b: same, shape [..., K, N]
    :return: complex df32 4-tuple [..., M, N]
    """
    ar = (a[0], a[1])
    ai = (a[2], a[3])
    br = (b[0], b[1])
    bi = (b[2], b[3])
    p1 = df_matmul(ar, br, keep, n_chunks)
    p2 = df_matmul(ai, bi, keep, n_chunks)
    asum = df_add(ar, ai)
    bsum = df_add(br, bi)
    p3 = df_matmul(asum, bsum, keep, n_chunks)
    re = df_add(p1, (-p2[0], -p2[1]))
    im = df_add(df_add(p3, (-p1[0], -p1[1])), (-p2[0], -p2[1]))
    return re + im


# ------------------------------------------------------ split four-step FFT


def _left_cmatmul(F_cdf, x_cdf, keep=KEEP, n_chunks=N_CHUNKS):
    """Apply a constant complex df32 matrix to the second-to-last axis:
    ``out[..., p, r] = sum_q F[p, q] * x[..., q, r]``."""
    P, Q = F_cdf[0].shape

    def flat(plane):
        moved = jnp.moveaxis(plane, -2, 0)  # [Q, ..., R]
        return moved.reshape(Q, -1)

    lead = x_cdf[0].shape[:-2]
    R = x_cdf[0].shape[-1]
    xf = tuple(flat(p) for p in x_cdf)
    of = df_cmatmul(F_cdf, xf, keep=keep, n_chunks=n_chunks)

    def unflat(plane):
        return jnp.moveaxis(
            plane.reshape((P,) + lead + (R,)), 0, -2
        )

    return tuple(unflat(p) for p in of)


@functools.lru_cache(maxsize=None)
def _df_fft_consts(n, inverse):
    """Split-precision constants of the shifted four-step transform."""
    from .fft_mxu import fft_mxu_plan

    plan = fft_mxu_plan(n, inverse)
    if plan is None:
        return None
    N1, N2, F1, W, F2 = plan
    return (
        N1,
        N2,
        cdf_from_c128(F1),
        cdf_from_c128(W),
        cdf_from_c128(F2),
    )


def df_fft_mxu(x_cdf, inverse=False, keep=KEEP, n_chunks=N_CHUNKS):
    """Centre-zero FFT along the last axis in split precision.

    Same semantics as :func:`.fft_mxu.fft_mxu` (fftshift-convention
    transform via factor matmuls) with the matmuls exact-chunked and the
    twiddle multiply in df32 — relative error ~1e-13 instead of ~1e-7.

    :param x_cdf: complex df32 4-tuple, shape [..., n]
    :return: complex df32 4-tuple, same shape
    """
    n = x_cdf[0].shape[-1]
    consts = _df_fft_consts(n, inverse)
    if consts is None:
        raise ValueError(f"no four-step factorisation for n={n}")
    N1, N2, F1c, Wc, F2c = consts
    lead = x_cdf[0].shape[:-1]

    xr = tuple(p.reshape(lead + (N1, N2)) for p in x_cdf)
    t1 = _left_cmatmul(F1c, xr, keep, n_chunks)  # [..., c, b]
    t2 = df_cmul(t1, tuple(jnp.broadcast_to(p, t1[0].shape) for p in Wc))
    # out[..., d, c] = sum_b F2[d, b] t2[..., c, b]
    t2t = tuple(jnp.swapaxes(p, -1, -2) for p in t2)  # [..., b, c]
    out = _left_cmatmul(F2c, t2t, keep, n_chunks)  # [..., d, c]
    return tuple(p.reshape(lead + (n,)) for p in out)
