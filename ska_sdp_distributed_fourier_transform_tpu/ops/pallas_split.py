"""Fused Pallas kernel for the split-precision (double-f32) matmuls.

The ``--precision split`` tier (:mod:`.split_precision`,
:mod:`..parallel.split_stream`) reaches f64-class accuracy on bf16/f32
hardware by computing every contraction as exact integer-chunked MXU
matmuls. The pure-XLA formulation materialises the chunk arrays and
~20 dot results per product in HBM and runs the two-sum recombination
ladders as separate elementwise passes — measured 12.7x the c64 tier
at 4k where the chunked matmuls alone model at ~2.3x.

This kernel fuses the whole product — chunking of the streamed operand,
all chunk-pair MXU dots, diagonal combination and the complex
(Karatsuba) recombination — into one ``pallas_call``:

* the *constant* operand (operator matrices, DFT factors — everything
  the stream multiplies by is static per configuration) is pre-chunked
  once on host in float64 (exact) and stored as bf16 integer chunks;
* the *data* operand is chunked in-register from its (hi, lo) f32
  pair, once per input tile (re-used across all output tiles that
  consume it);
* chunk bits ``b`` are chosen per call so that a whole kept diagonal
  accumulates exactly in plain f32 adds — ``m * K * 2^{2b} <= 2^24``
  (the XLA path instead uses b=7 with two-sum chains; trading ~33%
  more MXU passes for ~5x less VPU work wins once everything is
  VMEM-resident);
* diagonals are combined with one two-sum ladder per output tile and
  the three Karatsuba products recombine in VMEM; only the final
  (hi, lo) planes reach HBM.

Accuracy is the same class as the XLA path (~42 mantissa bits of the
operand max per product; measured ~1e-11-class round trips), at a
fraction of the runtime.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _is_tpu

__all__ = [
    "choose_chunking",
    "prechunk_const",
    "gather_prechunked_rows",
    "PrechunkedConst",
    "dfc_matmul",
    "dfc_fits_vmem",
    "df_fft_pallas",
]

# Mantissa bits of the operand carried by the chunk representation
# (df32 pairs hold ~48; 42 puts the truncation at the same level as
# the XLA path's keep=5/n_chunks=6 default).
_TARGET_BITS = 42


def choose_chunking(K: int):
    """Pick ``(bits, m)``: the largest chunk width whose kept diagonals
    accumulate exactly in plain f32 — ``m * K * 2^{2*bits} <= 2^24``
    with ``m = ceil(42 / bits)`` chunks covering the df32 mantissa."""
    for bits in (7, 6, 5, 4, 3):
        m = -(-_TARGET_BITS // bits)
        if m * K * (1 << (2 * bits)) <= 1 << 24:
            return bits, m
    raise ValueError(f"contraction depth K={K} too large for exact "
                     "f32 chunk accumulation")


class PrechunkedConst(NamedTuple):
    """One matmul operand in integer-chunk form (the three Karatsuba
    planes: real, imag, real+imag), plus the power-of-two scales.

    Chunk arrays have a leading batch dim G and a chunk dim m:
    ``[G, m, R, C]`` bf16 with every value an integer in
    [-2^{bits-1}, 2^{bits-1}]; ``plane ~= scale * sum_i chunks[i] *
    2^{-bits*(i+1)}``.
    """

    crr: jax.Array  # [G, m, R, C] bf16 — chunks of Re
    cii: jax.Array  # chunks of Im
    css: jax.Array  # chunks of Re + Im
    s_r: float
    s_i: float
    s_s: float
    bits: int


def _host_chunk_plane(plane: np.ndarray, bits: int, m: int):
    """Exactly chunk a float64 plane: returns ([m, ...] bf16, scale)."""
    plane = np.asarray(plane, dtype=np.float64)
    amax = float(np.max(np.abs(plane))) if plane.size else 0.0
    k = int(math.ceil(math.log2(max(amax, 1e-300)))) if amax > 0 else 0
    scale = math.ldexp(1.0, k)
    r = plane / scale
    mul = float(1 << bits)
    chunks = np.empty((m,) + plane.shape, dtype=np.float64)
    for i in range(m):
        r = r * mul
        c = np.rint(r)
        r = r - c
        chunks[i] = c
    # bf16 holds integers up to 2^8 exactly; |c| <= 2^{bits-1} + 1
    return jnp.asarray(chunks.astype(jnp.bfloat16)), scale


def prechunk_const(z: np.ndarray, K: int | None = None):
    """Pre-chunk a complex128 constant operand on host.

    :param z: complex array ``[..., R, C]`` (leading dims flattened
        into the batch dim G; a 2-D input gets G=1)
    :param K: contraction depth the operand will be used with
        (defaults to the second-to-last axis — correct for a
        right-hand operand; pass the last axis for a left-hand one)
    :return: :class:`PrechunkedConst`
    """
    z = np.asarray(z, dtype=np.complex128)
    if z.ndim == 2:
        z = z[None]
    else:
        z = z.reshape((-1,) + z.shape[-2:])
    if K is None:
        K = z.shape[-2]
    bits, m = choose_chunking(K)
    crr, s_r = _host_chunk_plane(z.real, bits, m)
    cii, s_i = _host_chunk_plane(z.imag, bits, m)
    css, s_s = _host_chunk_plane(z.real + z.imag, bits, m)
    crr = jnp.moveaxis(crr, 0, 1)  # [G, m, R, C]
    cii = jnp.moveaxis(cii, 0, 1)
    css = jnp.moveaxis(css, 0, 1)
    return PrechunkedConst(crr, cii, css, s_r, s_i, s_s, bits)


def gather_prechunked_rows(pc: PrechunkedConst, rows, transpose=False):
    """Gather rows of a G=1 prechunked constant into a batched one.

    ``rows`` may be ``[R']`` (result stays G=1) or ``[B, R']`` (result
    G=B). With ``transpose=True`` the gathered block is transposed in
    the last two axes (for right-hand operands wanted as ``X^T``).
    Gathers act on the bf16 chunk planes — exact data movement — and
    the scales are inherited (row subsets can only shrink the max).
    """
    rows = jnp.asarray(rows, jnp.int32)

    def g(c):
        # c: [1, m, R, C]
        taken = jnp.take(c[0], rows, axis=1)  # [m, R'] or [m, B, R'] +C
        if rows.ndim == 1:
            out = taken[None]  # [1, m, R', C]
        else:
            out = jnp.moveaxis(taken, 1, 0)  # [B, m, R', C]
        if transpose:
            out = jnp.swapaxes(out, -1, -2)
        return out

    return PrechunkedConst(
        g(pc.crr), g(pc.cii), g(pc.css),
        pc.s_r, pc.s_i, pc.s_s, pc.bits,
    )


# ------------------------------------------------------------------ kernel


def _two_sum(a, b):
    s = a + b
    v = s - a
    e = (a - (s - v)) + (b - v)
    return s, e


def _chunk_tile(rh, rl, m, bits, out_ref, set_idx):
    """Chunk a normalised (hi, lo) f32 tile into ``m`` integer bf16
    chunks, written into ``out_ref[set_idx, i]``."""
    mul = jnp.float32(1 << bits)
    for i in range(m):
        rh = rh * mul
        rl = rl * mul
        c = jnp.round(rh)
        rh = rh - c
        rh, rl = _two_sum(rh, rl)
        out_ref[set_idx, i] = c.astype(jnp.bfloat16)


def _product_tile(dot, m, bits):
    """All kept chunk-pair dots of one Karatsuba product, diagonals
    accumulated in plain f32 (exact by choose_chunking), combined with
    one two-sum ladder. ``dot(i, j)`` multiplies chunk i of one
    operand by chunk j of the other; returns an (hi, lo) f32 pair."""
    hi = None
    lo = None
    for d in range(m):
        acc = None
        for i in range(d + 1):
            t = dot(i, d - i)
            acc = t if acc is None else acc + t
        w = jnp.float32(math.ldexp(1.0, -bits * (d + 2)))
        term = acc * w
        if hi is None:
            hi, lo = term, jnp.zeros_like(term)
        else:
            hi, e = _two_sum(hi, term)
            lo = lo + e
    return hi, lo


def _df_scale(p, w):
    return p[0] * w, p[1] * w


def _df_add(x, y):
    s, e = _two_sum(x[0], y[0])
    e = e + (x[1] + y[1])
    hi = s + e
    lo = e - (hi - s)
    return hi, lo


def _df_neg(x):
    return -x[0], -x[1]


def _make_kernel(m, bits, const_side):
    """Kernel body. Grid is (G, out_tile, data_tile-orthogonal) with
    the *data-orthogonal* axis innermost so the in-register chunking of
    the data tile runs once per data tile (program_id(2) == 0)."""

    def kernel(inv_ref, wrr_ref, wii_ref, wss_ref,
               dh_r, dl_r, dh_i, dl_i,
               crr_ref, cii_ref, css_ref,
               orh, orl, oih, oil,
               ach):
        inner = pl.program_id(2)

        @pl.when(inner == 0)
        def _():
            inv = inv_ref[0, 0]
            rh = dh_r[0] * inv
            rl = dl_r[0] * inv
            ih = dh_i[0] * inv
            il = dl_i[0] * inv
            _chunk_tile(rh, rl, m, bits, ach, 0)
            _chunk_tile(ih, il, m, bits, ach, 1)
            # re+im, normalised by inv/2 (|re+im| <= 2 amax)
            sh, se = _two_sum(rh * 0.5, ih * 0.5)
            sl = se + (rl + il) * 0.5
            _chunk_tile(sh, sl, m, bits, ach, 2)

        f32 = jnp.float32
        if const_side == "right":
            def prod(set_idx, c_ref):
                return _product_tile(
                    lambda i, j: jnp.dot(ach[set_idx, i], c_ref[0, j],
                                         preferred_element_type=f32),
                    m, bits,
                )
        else:
            def prod(set_idx, c_ref):
                # const chunks on the left: dot(c[i], a[set, j])
                return _product_tile(
                    lambda i, j: jnp.dot(c_ref[0, i], ach[set_idx, j],
                                         preferred_element_type=f32),
                    m, bits,
                )

        p_rr = _df_scale(prod(0, crr_ref), wrr_ref[0, 0])
        p_ii = _df_scale(prod(1, cii_ref), wii_ref[0, 0])
        p_ss = _df_scale(prod(2, css_ref), wss_ref[0, 0])

        re = _df_add(p_rr, _df_neg(p_ii))
        im = _df_add(_df_add(p_ss, _df_neg(p_rr)), _df_neg(p_ii))
        orh[0] = re[0]
        orl[0] = re[1]
        oih[0] = im[0]
        oil[0] = im[1]

    return kernel


def _vmem_bytes(TM, TN, K, m, const_side):
    """Modeled VMEM of one grid step: chunk scratch + double-buffered
    data/const/output blocks. The contraction depth K is untiled."""
    if const_side == "right":
        scratch = 3 * m * TM * K * 2
        data = 2 * 4 * TM * K * 4
        const = 2 * 3 * m * K * TN * 2
    else:
        scratch = 3 * m * K * TN * 2
        data = 2 * 4 * K * TN * 4
        const = 2 * 3 * m * TM * K * 2
    return scratch + data + const + 2 * 4 * TM * TN * 4


def _plan_tiles(M, K, N, const_side, budget=12_800_000):
    """Pick ``(TM, TN)`` fitting the calibrated VMEM budget, shrinking
    the streamed-block tiles before the 128-lane dimension; ``None``
    when no tiling fits (K untiled in the chunk scratch — callers fall
    back to the XLA formulation).

    Budget calibration (first hardware compile, 2026-08-18, v5e): at
    K=448/m=7/left, the model's 14.36M plan compiled to a 17.11M
    Mosaic stack allocation — a 1.19x overhead (alignment padding +
    compiler temporaries) against the 16M scoped-vmem limit. 12.8M
    keeps the modeled plan's real footprint under the limit with
    margin (12.8 * 1.19 = 15.2M)."""
    bits, m = choose_chunking(K)
    del bits
    if const_side == "right":
        cands = [(256, 128), (128, 128), (64, 128), (32, 128),
                 (16, 128), (16, 64)]
    else:
        cands = [(128, 256), (128, 128), (64, 128), (32, 128),
                 (16, 128), (16, 64)]
    for cm, cn in cands:
        TM = _pick_tile(M, cm)
        TN = _pick_tile(N, cn)
        if _vmem_bytes(TM, TN, K, m, const_side) <= budget:
            return TM, TN
    return None


def dfc_fits_vmem(M, K, N, const_side, budget=12_800_000):
    """Whether any tiling of one :func:`dfc_matmul` call fits the
    calibrated VMEM budget."""
    return _plan_tiles(M, K, N, const_side, budget) is not None


def _pick_tile(n, cap):
    """Tile size <= cap, multiple of 16 (bf16 sublane tiling for the
    chunk scratch); edge blocks are handled by the cdiv grid + Pallas'
    clipped writes (padded reads only affect clipped rows/cols)."""
    if n >= cap:
        return cap
    return -(-n // 16) * 16


@functools.partial(
    jax.jit,
    static_argnames=("m", "bits", "const_side", "const_batched",
                     "interpret"),
)
def _dfc_matmul_call(inv, wrr, wii, wss, dplanes, cchunks,
                     m, bits, const_side, const_batched, interpret):
    crr, cii, css = cchunks
    if const_side == "right":
        G, M, K = dplanes[0].shape
        N = crr.shape[-1]
        tiles = _plan_tiles(M, K, N, const_side)
        if tiles is None:
            raise ValueError(
                f"dfc_matmul does not fit VMEM at K={K} "
                "(use the XLA formulation)"
            )
        TM, TN = tiles
        grid = (G, pl.cdiv(M, TM), pl.cdiv(N, TN))  # N innermost
        d_spec = pl.BlockSpec((1, TM, K), lambda g, i, j: (g, i, 0),
                              memory_space=_ms(interpret))
        c_spec = pl.BlockSpec(
            (1, m, K, TN),
            (lambda g, i, j: (g, 0, 0, j)) if const_batched
            else (lambda g, i, j: (0, 0, 0, j)),
            memory_space=_ms(interpret))
        o_spec = pl.BlockSpec((1, TM, TN), lambda g, i, j: (g, i, j),
                              memory_space=_ms(interpret))
        scratch = pltpu.VMEM((3, m, TM, K), jnp.bfloat16)
        flops = 6 * G * M * N * K * ((m * (m + 1)) // 2) // m
    else:
        G, K, N = dplanes[0].shape
        M = crr.shape[-2]
        tiles = _plan_tiles(M, K, N, const_side)
        if tiles is None:
            raise ValueError(
                f"dfc_matmul does not fit VMEM at K={K} "
                "(use the XLA formulation)"
            )
        TM, TN = tiles
        grid = (G, pl.cdiv(N, TN), pl.cdiv(M, TM))  # M innermost
        d_spec = pl.BlockSpec((1, K, TN), lambda g, j, i: (g, 0, j),
                              memory_space=_ms(interpret))
        c_spec = pl.BlockSpec(
            (1, m, TM, K),
            (lambda g, j, i: (g, 0, i, 0)) if const_batched
            else (lambda g, j, i: (0, 0, i, 0)),
            memory_space=_ms(interpret))
        o_spec = pl.BlockSpec((1, TM, TN), lambda g, j, i: (g, i, j),
                              memory_space=_ms(interpret))
        scratch = pltpu.VMEM((3, m, K, TN), jnp.bfloat16)
        flops = 6 * G * M * N * K * ((m * (m + 1)) // 2) // m

    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # inherit the varying-mesh-axes type of the streamed operand so the
    # call traces under shard_map(check_vma=True) (the data planes and
    # outputs are facet-sharded in the mesh split tier)
    try:
        vma = jax.typeof(dplanes[0]).vma
    except Exception:
        vma = None
    if vma:
        out_shape = [
            jax.ShapeDtypeStruct((G, M, N), jnp.float32, vma=vma)
        ] * 4
    else:
        out_shape = [jax.ShapeDtypeStruct((G, M, N), jnp.float32)] * 4
    return pl.pallas_call(
        _make_kernel(m, bits, const_side),
        grid=grid,
        in_specs=[s_spec] * 4 + [d_spec] * 4 + [c_spec] * 3,
        out_specs=[o_spec] * 4,
        out_shape=out_shape,
        scratch_shapes=[scratch],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * 4 * G * M * (K + N)
            + 3 * m * 2 * (G if const_batched else 1) * K
            * (N if const_side == "right" else M),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(inv, wrr, wii, wss, *dplanes, crr, cii, css)


def _ms(interpret):
    return pl.ANY if interpret else pltpu.VMEM


def dfc_matmul(data_cdf, const: PrechunkedConst, const_side,
               interpret=None):
    """Complex df32 matmul of a streamed operand against a pre-chunked
    constant, fused into one Pallas kernel.

    :param data_cdf: complex df32 4-tuple ``(re_hi, re_lo, im_hi,
        im_lo)`` of f32 arrays — shape ``[G, M, K]`` (const_side
        "right") or ``[G, K, N]`` (const_side "left"); a 2-D input is
        treated as G=1
    :param const: :class:`PrechunkedConst` — ``[G', m, K, N]``
        ("right") or ``[G', m, M, K]`` ("left") with G' == G
        (batched) or G' == 1 (shared across the batch)
    :param const_side: which side of the product the constant is on
    :return: complex df32 4-tuple ``[G, M, N]`` (2-D if input was 2-D)
    """
    if interpret is None:
        interpret = not _is_tpu()
    squeeze = data_cdf[0].ndim == 2
    dplanes = tuple(p[None] if squeeze else p for p in data_cdf)
    G = dplanes[0].shape[0]
    Gc = const.crr.shape[0]
    if Gc not in (1, G):
        raise ValueError(f"const batch {Gc} incompatible with data {G}")
    const_batched = Gc == G and G > 1 or (Gc == G == 1)

    bits = const.bits
    m = -(-_TARGET_BITS // bits)
    amax = jnp.maximum(
        jnp.max(jnp.abs(dplanes[0])), jnp.max(jnp.abs(dplanes[2]))
    )
    k = jnp.ceil(
        jnp.log2(jnp.maximum(amax, jnp.float32(1e-30)))
    ).astype(jnp.int32)
    one = jnp.float32(1.0)
    inv = jnp.ldexp(one, -k).reshape(1, 1)
    s_a = jnp.ldexp(one, k)
    wrr = (s_a * jnp.float32(const.s_r)).reshape(1, 1)
    wii = (s_a * jnp.float32(const.s_i)).reshape(1, 1)
    # the re+im plane was normalised by inv/2 -> scale back by 2
    wss = (s_a * jnp.float32(2.0 * const.s_s)).reshape(1, 1)

    outs = _dfc_matmul_call(
        inv, wrr, wii, wss, dplanes,
        (const.crr, const.cii, const.css),
        m, bits, const_side, const_batched, interpret,
    )
    if squeeze:
        outs = tuple(p[0] for p in outs)
    return tuple(outs)


# ------------------------------------------------- fused split four-step FFT


@functools.lru_cache(maxsize=None)
def _df_fft_consts_pc(n, inverse):
    """Pre-chunked factor matrices of the shifted four-step transform
    (+ the twiddle in cdf form for the XLA elementwise multiply)."""
    from .fft_mxu import fft_mxu_plan
    from .split_precision import cdf_from_c128

    plan = fft_mxu_plan(n, inverse)
    if plan is None:
        return None
    N1, N2, F1, W, F2 = plan
    return (
        N1,
        N2,
        prechunk_const(F1, K=F1.shape[-1]),
        cdf_from_c128(W),
        prechunk_const(F2, K=F2.shape[-1]),
    )


def df_fft_pallas(x_cdf, inverse=False, interpret=None):
    """Centre-zero FFT along the last axis in split precision with the
    factor matmuls fused into the chunked Pallas kernel.

    Same semantics as :func:`.split_precision.df_fft_mxu`; the twiddle
    multiply stays an XLA df32 elementwise pass.

    :param x_cdf: complex df32 4-tuple, shape [..., n]
    :return: complex df32 4-tuple, same shape
    """
    from .split_precision import df_cmul

    n = x_cdf[0].shape[-1]
    consts = _df_fft_consts_pc(n, inverse)
    if consts is None:
        raise ValueError(f"no four-step factorisation for n={n}")
    N1, N2, F1pc, Wc, F2pc = consts
    lead = x_cdf[0].shape[:-1]

    def flat(x, Q):
        # [..., Q, R] -> [Q, prod(lead)*R]
        moved = tuple(jnp.moveaxis(p, -2, 0) for p in x)
        return tuple(p.reshape(Q, -1) for p in moved)

    def unflat(x, P, rest, R):
        return tuple(
            jnp.moveaxis(p.reshape((P,) + rest + (R,)), 0, -2)
            for p in x
        )

    xr = tuple(p.reshape(lead + (N1, N2)) for p in x_cdf)
    t1 = unflat(
        dfc_matmul(flat(xr, N1), F1pc, "left", interpret=interpret),
        F1pc.crr.shape[-2], lead, N2,
    )  # [..., c, b]
    t2 = df_cmul(
        t1, tuple(jnp.broadcast_to(p, t1[0].shape) for p in Wc)
    )
    t2t = tuple(jnp.swapaxes(p, -1, -2) for p in t2)  # [..., b, c]
    out = unflat(
        dfc_matmul(flat(t2t, N2), F2pc, "left", interpret=interpret),
        F2pc.crr.shape[-2], lead, t2t[0].shape[-1],
    )  # [..., d, c]
    return tuple(p.reshape(lead + (n,)) for p in out)
