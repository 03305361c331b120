"""Pallas TPU kernels for the SwiFTly hot contractions.

The operator-algebra engine (:mod:`.operators`, engine_mode="matmul")
spends its FLOPs in complex matmuls. XLA lowers a complex dot to 4 real
MXU dots; these kernels use the 3-multiplication (Karatsuba) form and keep
the real/imag planes in VMEM across the whole contraction:

* :func:`cmatmul` — tiled complex matmul ``C = A @ B`` as 3 real MXU dots
  per tile (25% less MXU time than the naive 4).
* :func:`fused_sandwich` — ``out[b] = sum_f A0[f] @ X[b, f] @ A1[f]^T``,
  the forward engine's add_to_subgrid_2d + facet-sum in one kernel: the
  per-facet intermediate ``A0 @ X`` never leaves VMEM and the facet sum
  accumulates into a VMEM scratch across grid steps.

Complex arrays are passed as (real, imag) float pairs — TPU has no complex
MXU path, and the split-plane layout is also what the engine's collectives
use. All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "cmatmul",
    "fused_sandwich",
    "fused_gather_sandwich",
    "fused_double_sandwich",
    "fused_lr_sandwich",
]


def _sds(shape, ref):
    """ShapeDtypeStruct inheriting the varying-mesh-axes type of ``ref``
    (required for pallas_call outputs inside shard_map)."""
    try:
        vma = jax.typeof(ref).vma
    except Exception:
        vma = None
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.float32)


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dot3(a, b):
    """~f32 matmul as 3 bf16 MXU passes (the "HIGH"-precision split,
    written out because Mosaic only lowers DEFAULT/HIGHEST dots): split
    each operand into a bf16 high part plus a bf16 residual and drop the
    residual-x-residual term."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    ah = a.astype(bf16)
    bh = b.astype(bf16)
    al = (a - ah.astype(f32)).astype(bf16)
    bl = (b - bh.astype(f32)).astype(bf16)
    d = lambda x, y: jnp.dot(x, y, preferred_element_type=f32)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _karatsuba(ar, ai, br, bi):
    """Complex product via 3 real dots (25% fewer MXU passes than the
    naive 4), each at ~f32 precision via the 3-pass bf16 split — the MXU
    single-pass bf16 default (~4e-3 relative) would swamp the c64 error
    budget."""
    p1 = _dot3(ar, br)
    p2 = _dot3(ai, bi)
    p3 = _dot3(ar + ai, br + bi)
    return p1 - p2, p3 - p1 - p2


def _cmatmul_kernel(ar_ref, ai_ref, br_ref, bi_ref, cr_ref, ci_ref):
    cr, ci = _karatsuba(ar_ref[:], ai_ref[:], br_ref[:], bi_ref[:])
    cr_ref[:] = cr
    ci_ref[:] = ci


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n",
                                             "interpret"))
def _cmatmul(ar, ai, br, bi, tile_m, tile_n, interpret):
    M, K = ar.shape
    N = br.shape[1]
    grid = (pl.cdiv(M, tile_m), pl.cdiv(N, tile_n))
    a_spec = pl.BlockSpec((tile_m, K), lambda i, j: (i, 0),
                          memory_space=pl.ANY if interpret else
                          pltpu.VMEM)
    b_spec = pl.BlockSpec((K, tile_n), lambda i, j: (0, j),
                          memory_space=pl.ANY if interpret else
                          pltpu.VMEM)
    c_spec = pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                          memory_space=pl.ANY if interpret else
                          pltpu.VMEM)
    out_shape = [_sds((M, N), ar), _sds((M, N), ar)]
    return pl.pallas_call(
        _cmatmul_kernel,
        grid=grid,
        in_specs=[a_spec, a_spec, b_spec, b_spec],
        out_specs=[c_spec, c_spec],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * M * N * K,
            bytes_accessed=4 * (2 * M * K + 2 * K * N + 2 * M * N),
            transcendentals=0,
        ),
        interpret=interpret,
    )(ar, ai, br, bi)


def cmatmul(a, b, tile_m=256, tile_n=256, interpret=None):
    """Complex matmul ``a @ b`` on the MXU via 3 real dots.

    :param a: complex array [M, K] (or a (real, imag) float tuple)
    :param b: complex array [K, N] (or a (real, imag) float tuple)
    :param interpret: force Pallas interpret mode (default: off on TPU)
    :return: complex64 array [M, N]
    """
    if interpret is None:
        interpret = not _is_tpu()
    ar, ai = (a if isinstance(a, tuple) else
              (jnp.real(a).astype(jnp.float32),
               jnp.imag(a).astype(jnp.float32)))
    br, bi = (b if isinstance(b, tuple) else
              (jnp.real(b).astype(jnp.float32),
               jnp.imag(b).astype(jnp.float32)))
    M, K = ar.shape
    N = br.shape[1]
    tile_m = min(tile_m, M)
    tile_n = min(tile_n, N)
    cr, ci = _cmatmul(ar, ai, br, bi, tile_m, tile_n, interpret)
    return jax.lax.complex(cr, ci)


# ---------------------------------------------------------------------------
# Fused sandwich: out[b] = sum_f A0[f] @ X[b, f] @ A1[f]^T
# ---------------------------------------------------------------------------


def _sandwich_kernel(a0r_ref, a0i_ref, xr_ref, xi_ref, a1r_ref, a1i_ref,
                     or_ref, oi_ref, acc_r, acc_i):
    f = pl.program_id(2)
    n_f = pl.num_programs(2)

    @pl.when(f == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    # T = A0_f[row block] @ X[b, f]   [TM, c] — stays in VMEM
    tr, ti = _karatsuba(a0r_ref[0], a0i_ref[0], xr_ref[0, 0], xi_ref[0, 0])
    # S = T @ A1t_f                   [TM, xM] (A1 arrives pre-transposed
    # [F, c, xM]: in-kernel transposes are slow sublane shuffles)
    sr, si = _karatsuba(tr, ti, a1r_ref[0], a1i_ref[0])
    acc_r[:] += sr
    acc_i[:] += si

    @pl.when(f == n_f - 1)
    def _():
        or_ref[0] = acc_r[:]
        oi_ref[0] = acc_i[:]


def _sandwich_tile_m(xM, c):
    """Row-block size keeping the working set inside VMEM (~16 MB/core).

    Per grid step (f32 words): input blocks are double-buffered by the
    pipeline — A0 block 2·TM·c, X 2·c², A1 2·xM·c, each ×2 — plus the
    accumulator 2·TM·xM and the double-buffered output block 4·TM·xM.
    """
    # Calibrated against Mosaic's scoped-vmem accounting (which also
    # stacks the kernel's bf16-split and intermediate temporaries):
    # measured 18.94 MB at TM=256, c=512, xM=512.
    budget = 15_500_000 // 4  # f32 words (model matches Mosaic within 2%)
    fixed = 11 * (c * c + xM * c) // 2
    tm = (budget - fixed) // max(9 * c + 6 * xM, 1)
    tm = max(min(tm, xM), 8)
    # largest power-of-two-ish divisor alignment
    for cand in (xM, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= tm and xM % cand == 0:
            return cand
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_sandwich(a0r, a0i, xr, xi, a1r, a1i, interpret):
    # a1r/a1i arrive pre-transposed: [F, c, xM]
    F, xM, c = a0r.shape
    B = xr.shape[0]
    TM = xM if interpret else _sandwich_tile_m(xM, c)
    grid = (B, xM // TM, F)
    ms = pl.ANY if interpret else pltpu.VMEM
    a0_spec = pl.BlockSpec((1, TM, c), lambda b, m, f: (f, m, 0),
                           memory_space=ms)
    a1_spec = pl.BlockSpec((1, c, xM), lambda b, m, f: (f, 0, 0),
                           memory_space=ms)
    x_spec = pl.BlockSpec((1, 1, c, c), lambda b, m, f: (b, f, 0, 0),
                          memory_space=ms)
    o_spec = pl.BlockSpec((1, TM, xM), lambda b, m, f: (b, m, 0),
                          memory_space=ms)
    out_shape = [_sds((B, xM, xM), xr), _sds((B, xM, xM), xr)]
    return pl.pallas_call(
        _sandwich_kernel,
        grid=grid,
        in_specs=[a0_spec, a0_spec, x_spec, x_spec, a1_spec, a1_spec],
        out_specs=[o_spec, o_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((TM, xM), jnp.float32),
            pltpu.VMEM((TM, xM), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * F * (xM * c * c + xM * xM * c),
            bytes_accessed=4 * (2 * F * xM * c * 2 + 2 * B * F * c * c
                                + 2 * B * xM * xM),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a0r, a0i, xr, xi, a1r, a1i)


def fused_sandwich(A0, X, A1, interpret=None):
    """``out[b] = sum_f A0[f] @ X[b, f] @ A1[f]^T`` in one Pallas kernel.

    The forward engine's hot contraction (add_to_subgrid_2d over all local
    facets, summed): per (b, f) grid step the intermediate ``A0 @ X`` and
    the running facet sum live in VMEM only.

    :param A0: complex [F, xM, c] or (real, imag) float tuple
    :param X: complex [B, F, c, c] or (real, imag) float tuple
    :param A1: complex [F, xM, c] or (real, imag) float tuple
    :return: complex64 [B, xM, xM]
    """
    if interpret is None:
        interpret = not _is_tpu()

    def split(z):
        if isinstance(z, tuple):
            return z
        return (jnp.real(z).astype(jnp.float32),
                jnp.imag(z).astype(jnp.float32))

    a0r, a0i = split(A0)
    xr, xi = split(X)
    a1r, a1i = split(A1)
    a1r = jnp.swapaxes(a1r, -1, -2)  # [F, c, xM] — kernel wants A1^T
    a1i = jnp.swapaxes(a1i, -1, -2)

    F, xM, c = a0r.shape
    if not interpret and _sandwich_tile_m(xM, c) < 32:
        # Contribution size too large for the kernel's VMEM working set
        # (X and A1 are held whole per grid step) — use the XLA einsum,
        # which tiles every dimension.
        out = jnp.einsum(
            "fqk,bfkl,flr->bqr",
            jax.lax.complex(a0r, a0i),
            jax.lax.complex(xr, xi),
            jax.lax.complex(a1r, a1i),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(jnp.complex64)

    outr, outi = _fused_sandwich(a0r, a0i, xr, xi, a1r, a1i, interpret)
    return jax.lax.complex(outr, outi)


# ---------------------------------------------------------------------------
# Gather-fused sandwich: out[b] = sum_f A0[f] @ W(N[f], s_b) @ A1[f]^T
# ---------------------------------------------------------------------------


def _gather_sandwich_kernel(c, qb_ref, rb_ref, tb_ref,
                            a0r_ref, a0i_ref, n0r_ref, n0i_ref,
                            n1r_ref, n1i_ref, a1r_ref, a1i_ref,
                            or_ref, oi_ref, acc_r, acc_i):
    b = pl.program_id(0)
    f = pl.program_id(2)
    n_f = pl.num_programs(2)
    del qb_ref  # consumed by the index maps only

    @pl.when(f == 0)
    def _():
        acc_r[:] = jnp.zeros_like(acc_r)
        acc_i[:] = jnp.zeros_like(acc_i)

    # The two c-wide lane blocks covering the window; rotate the pair
    # left by the in-block remainder so the window starts at lane 0,
    # then apply the engine's in-window roll by the scaled offset
    # (extract_from_facet's trailing ``roll(+s)``).
    rb = rb_ref[b]
    tb = tb_ref[b]

    def win(p0, p1):
        # pltpu.roll lowers to the hardware dynamic lane rotate (a
        # traced-shift jnp.roll would become unaligned dynamic slices)
        w = pltpu.roll(
            jnp.concatenate([p0, p1], axis=1), -rb, 1
        )[:, :c]
        return pltpu.roll(w, tb, 1)

    xr = win(n0r_ref[0], n1r_ref[0])
    xi = win(n0i_ref[0], n1i_ref[0])

    tr, ti = _karatsuba(a0r_ref[0], a0i_ref[0], xr, xi)
    sr, si = _karatsuba(tr, ti, a1r_ref[0], a1i_ref[0])
    acc_r[:] += sr
    acc_i[:] += si

    @pl.when(f == n_f - 1)
    def _():
        or_ref[0] = acc_r[:]
        oi_ref[0] = acc_i[:]


def _gather_tile_m(xM, c):
    """VMEM model for the gather-fused kernel (same calibrated budget as
    :func:`_sandwich_tile_m`): the four double-buffered window blocks
    plus the concat/roll temporaries replace the X pair."""
    budget = 15_500_000 // 4
    fixed = 16 * c * c + 11 * xM * c // 2
    tm = (budget - fixed) // max(9 * c + 6 * xM, 1)
    tm = max(min(tm, xM), 8)
    for cand in (xM, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= tm and xM % cand == 0:
            return cand
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_gather_sandwich(qb, rb, tb, a0r, a0i, nr, ni, a1r, a1i,
                           interpret):
    # nr/ni: [F, c, yN + 2c] (cyclic lane extension); a1r/a1i arrive
    # pre-transposed [F, c, xM]
    F, xM, c = a0r.shape
    B = qb.shape[0]
    TM = xM if interpret else _gather_tile_m(xM, c)
    grid = (B, xM // TM, F)
    ms = pl.ANY if interpret else pltpu.VMEM
    a0_spec = pl.BlockSpec(
        (1, TM, c), lambda b, m, f, q, r, t: (f, m, 0),
        memory_space=ms)
    a1_spec = pl.BlockSpec(
        (1, c, xM), lambda b, m, f, q, r, t: (f, 0, 0),
        memory_space=ms)
    n0_spec = pl.BlockSpec(
        (1, c, c), lambda b, m, f, q, r, t: (f, 0, q[b]),
        memory_space=ms)
    n1_spec = pl.BlockSpec(
        (1, c, c), lambda b, m, f, q, r, t: (f, 0, q[b] + 1),
        memory_space=ms)
    o_spec = pl.BlockSpec(
        (1, TM, xM), lambda b, m, f, q, r, t: (b, m, 0),
        memory_space=ms)
    out_shape = [_sds((B, xM, xM), nr), _sds((B, xM, xM), nr)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[a0_spec, a0_spec, n0_spec, n0_spec, n1_spec, n1_spec,
                  a1_spec, a1_spec],
        out_specs=[o_spec, o_spec],
        scratch_shapes=[
            pltpu.VMEM((TM, xM), jnp.float32),
            pltpu.VMEM((TM, xM), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_sandwich_kernel, c),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qb, rb, tb, a0r, a0i, nr, ni, nr, ni, a1r, a1i)


def fused_gather_sandwich(A0, NMBF_BF, scaled_off, A1, interpret=None):
    """``out[b] = sum_f A0[f] @ X_b[f] @ A1[f]^T`` with the per-subgrid
    wrap-window extraction fused into the kernel.

    ``X_b[f] = extract_from_facet(NMBF_BF[f], off1_b, axis=1)`` — the
    column engine's per-subgrid extraction (a cyclic window gather at
    the scaled subgrid offset followed by an in-window ``roll(+s)``,
    ops/core.py ``_roll_extract_roll``), which the unfused path
    materialises as a [B, F, c, c] array in HBM before the contraction.
    Here the window blocks are streamed straight from the column
    contribution array via scalar-prefetched block indices and aligned
    in-register with dynamic lane rotates; the gather never touches
    HBM as a separate pass.

    :param A0: complex [F, xM, c] or (real, imag) float tuple
    :param NMBF_BF: complex [F, c, yN] or (real, imag) float tuple —
        the per-column prepared facet contributions
    :param scaled_off: int32 [B] — per-subgrid offsets already scaled
        into the yN grid (``_scale_off(sg_off1, N // yN)``)
    :param A1: complex [F, xM, c] or (real, imag) float tuple
    :return: complex64 [B, xM, xM]
    """
    if interpret is None:
        interpret = not _is_tpu()

    def split(z):
        if isinstance(z, tuple):
            return z
        return (jnp.real(z).astype(jnp.float32),
                jnp.imag(z).astype(jnp.float32))

    a0r, a0i = split(A0)
    nr, ni = split(NMBF_BF)
    a1r, a1i = split(A1)
    a1r = jnp.swapaxes(a1r, -1, -2)  # [F, c, xM] — kernel wants A1^T
    a1i = jnp.swapaxes(a1i, -1, -2)

    F, xM, c = a0r.shape
    yN = nr.shape[-1]
    scaled_off = scaled_off.astype(jnp.int32)
    starts = jnp.mod(yN // 2 - c // 2 + scaled_off, yN)
    qb = starts // c
    rb = starts % c
    tb = jnp.mod(scaled_off, c)

    if not interpret and _gather_tile_m(xM, c) < 32:
        # Working set too large — fall back to the unfused formulation.
        from .core import _roll_extract_roll

        X = jax.vmap(
            lambda s: (_roll_extract_roll(nr, s, c, 2),
                       _roll_extract_roll(ni, s, c, 2))
        )(scaled_off)  # pair of [B, F, c, c]
        return fused_sandwich(A0, X, A1, interpret=interpret)

    # Cyclic lane extension: blocks q and q+1 are always in range.
    nr = jnp.concatenate([nr, nr[:, :, : 2 * c]], axis=-1)
    ni = jnp.concatenate([ni, ni[:, :, : 2 * c]], axis=-1)

    outr, outi = _fused_gather_sandwich(
        qb, rb, tb, a0r, a0i, nr, ni, a1r, a1i, interpret
    )
    return jax.lax.complex(outr, outi)


# ---------------------------------------------------------------------------
# Fused double sandwich: out[b, f] = E0[f] @ FS[b] @ E1[f]^T
# ---------------------------------------------------------------------------


def _dsandwich_kernel(e0r_ref, e0i_ref, fsr_ref, fsi_ref, e1r_ref,
                      e1i_ref, or_ref, oi_ref):
    # T = E0_f @ FS_b        [c, xM] — VMEM-resident
    tr, ti = _karatsuba(e0r_ref[0], e0i_ref[0], fsr_ref[0], fsi_ref[0])
    # out = T @ E1t_f        [c, c] (E1 arrives pre-transposed [F, xM, c])
    sr, si = _karatsuba(tr, ti, e1r_ref[0], e1i_ref[0])
    or_ref[0, 0] = sr
    oi_ref[0, 0] = si


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_dsandwich(e0r, e0i, fsr, fsi, e1r, e1i, interpret):
    F, c, xM = e0r.shape
    B = fsr.shape[0]
    grid = (B, F)
    ms = pl.ANY if interpret else pltpu.VMEM
    e0_spec = pl.BlockSpec((1, c, xM), lambda b, f: (f, 0, 0),
                           memory_space=ms)
    e1_spec = pl.BlockSpec((1, xM, c), lambda b, f: (f, 0, 0),
                           memory_space=ms)
    fs_spec = pl.BlockSpec((1, xM, xM), lambda b, f: (b, 0, 0),
                           memory_space=ms)
    o_spec = pl.BlockSpec((1, 1, c, c), lambda b, f: (b, f, 0, 0),
                          memory_space=ms)
    out_shape = [_sds((B, F, c, c), fsr), _sds((B, F, c, c), fsr)]
    return pl.pallas_call(
        _dsandwich_kernel,
        grid=grid,
        in_specs=[e0_spec, e0_spec, fs_spec, fs_spec, e1_spec, e1_spec],
        out_specs=[o_spec, o_spec],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * F * (c * xM * xM + c * c * xM),
            bytes_accessed=4 * (4 * F * c * xM + 2 * B * xM * xM
                                + 2 * B * F * c * c),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(e0r, e0i, fsr, fsi, e1r, e1i)


def _dsandwich_fits(xM, c):
    """VMEM check (same calibrated model as the forward kernel): per
    step FS pair (double-buffered), two E pairs (double-buffered), the
    [c, xM] intermediate + temporaries, and the output block."""
    words = (
        4 * xM * xM          # FS pair, double-buffered
        + 8 * c * xM         # E0+E1 pairs, double-buffered
        + 5 * c * xM         # T + bf16 splits
        + 4 * c * c          # out block pair, double-buffered
    )
    return words <= 15_500_000 // 4


def fused_double_sandwich(E0, FS, E1, interpret=None):
    """``out[b, f] = E0[f] @ FS[b] @ E1[f]^T`` in one Pallas kernel.

    The backward engine's extraction (extract_from_subgrid along both
    axes for every facet): the [c, xM] intermediate never leaves VMEM.
    Falls back to an XLA einsum when the working set exceeds VMEM.

    :param E0: complex [F, c, xM] or (real, imag) float tuple
    :param FS: complex [B, xM, xM] or (real, imag) float tuple
    :param E1: complex [F, c, xM] or (real, imag) float tuple
    :return: complex64 [B, F, c, c]
    """
    if interpret is None:
        interpret = not _is_tpu()

    def split(z):
        if isinstance(z, tuple):
            return z
        return (jnp.real(z).astype(jnp.float32),
                jnp.imag(z).astype(jnp.float32))

    e0r, e0i = split(E0)
    fsr, fsi = split(FS)
    e1r, e1i = split(E1)
    e1r = jnp.swapaxes(e1r, -1, -2)  # [F, xM, c] — kernel wants E1^T
    e1i = jnp.swapaxes(e1i, -1, -2)
    F, c, xM = e0r.shape
    if not interpret and not _dsandwich_fits(xM, c):
        out = jnp.einsum(
            "fki,bij,fjl->bfkl",
            jax.lax.complex(e0r, e0i),
            jax.lax.complex(fsr, fsi),
            jax.lax.complex(e1r, e1i),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(jnp.complex64)
    outr, outi = _fused_dsandwich(e0r, e0i, fsr, fsi, e1r, e1i, interpret)
    return jax.lax.complex(outr, outi)


# ---------------------------------------------------------------------------
# Fused L/R sandwich: out[b] = L @ M[b] @ R[b]^T
# ---------------------------------------------------------------------------


def _lr_kernel(lr_ref, li_ref, mr_ref, mi_ref, rr_ref, ri_ref,
               or_ref, oi_ref):
    # T = L[row block] @ M[b]    [TP, r] — VMEM-resident
    tr, ti = _karatsuba(lr_ref[0], li_ref[0], mr_ref[0], mi_ref[0])
    # out = T @ Rt[b]            [TP, s] (R arrives pre-transposed [B, r, s])
    sr, si = _karatsuba(tr, ti, rr_ref[0], ri_ref[0])
    or_ref[0] = sr
    oi_ref[0] = si


def _lr_tile_p(p, q, r, s):
    """Row-block size for the L operand keeping the working set in VMEM.

    Same calibrated budget as :func:`_sandwich_tile_m`: per grid step the
    pipeline double-buffers the L block (2·TP·q), M (2·q·r) and Rt
    (2·r·s) pairs, plus the [TP, r] intermediate with its bf16-split
    temporaries and the double-buffered output block (4·TP·s).
    """
    budget = 15_500_000 // 4
    fixed = 4 * (q * r + r * s)
    per_tp = 4 * q + 5 * r + 4 * s
    tp = (budget - fixed) // max(per_tp, 1)
    tp = max(min(tp, p), 8)
    for cand in (p, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= tp and p % cand == 0:
            return cand
    return 8


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_lr(lr, li, mr, mi, rr, ri, interpret):
    # rr/ri arrive pre-transposed: [B, r, s]
    p, q = lr.shape
    B, _, r = mr.shape
    s = rr.shape[2]
    TP = p if interpret else _lr_tile_p(p, q, r, s)
    grid = (B, pl.cdiv(p, TP))
    ms = pl.ANY if interpret else pltpu.VMEM
    l_spec = pl.BlockSpec((1, TP, q), lambda b, i: (0, i, 0),
                          memory_space=ms)
    m_spec = pl.BlockSpec((1, q, r), lambda b, i: (b, 0, 0),
                          memory_space=ms)
    r_spec = pl.BlockSpec((1, r, s), lambda b, i: (b, 0, 0),
                          memory_space=ms)
    o_spec = pl.BlockSpec((1, TP, s), lambda b, i: (b, i, 0),
                          memory_space=ms)
    out_shape = [_sds((B, p, s), mr), _sds((B, p, s), mr)]
    lr3 = lr[jnp.newaxis]
    li3 = li[jnp.newaxis]
    return pl.pallas_call(
        _lr_kernel,
        grid=grid,
        in_specs=[l_spec, l_spec, m_spec, m_spec, r_spec, r_spec],
        out_specs=[o_spec, o_spec],
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * B * (p * q * r + p * r * s),
            bytes_accessed=4 * (2 * p * q + 2 * B * q * r
                                + 2 * B * r * s + 2 * B * p * s),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lr3, li3, mr, mi, rr, ri)


def fused_lr_sandwich(L, M, R, interpret=None):
    """``out[b] = L @ M[b] @ R[b]^T`` in one Pallas kernel.

    The subgrid-side sandwiches of the streaming engine — the forward
    ``finish_subgrid`` (``G0 @ summed @ G1^T``) and the backward
    ``prepare_subgrid`` (``P0 @ sg @ P1^T``) against offset-gathered
    rows/columns of the DFT matrices — share this shape: a per-batch
    complex congruence with a shared left operand. The ``L @ M``
    intermediate never leaves VMEM. Falls back to an XLA einsum when the
    working set exceeds VMEM.

    :param L: complex [p, q] or (real, imag) float tuple
    :param M: complex [B, q, r] or (real, imag) float tuple
    :param R: complex [B, s, r] or (real, imag) float tuple
    :return: complex64 [B, p, s]
    """
    if interpret is None:
        interpret = not _is_tpu()

    def split(z):
        if isinstance(z, tuple):
            return z
        return (jnp.real(z).astype(jnp.float32),
                jnp.imag(z).astype(jnp.float32))

    lr, li = split(L)
    mr, mi = split(M)
    rr, ri = split(R)
    rr = jnp.swapaxes(rr, -1, -2)  # [B, r, s] — kernel wants R^T
    ri = jnp.swapaxes(ri, -1, -2)
    p, q = lr.shape
    B, _, r = mr.shape
    s = rr.shape[2]
    if not interpret and _lr_tile_p(p, q, r, s) < 8:
        out = jnp.einsum(
            "pq,bqr,brs->bps",
            jax.lax.complex(lr, li),
            jax.lax.complex(mr, mi),
            jax.lax.complex(rr, ri),
            precision=jax.lax.Precision.HIGHEST,
        )
        return out.astype(jnp.complex64)
    outr, outi = _fused_lr(lr, li, mr, mi, rr, ri, interpret)
    return jax.lax.complex(outr, outi)
