"""Fused Pallas kernel for the yN-scale facet transforms.

The stage bisection (BENCH_SWEEP.md, round 2) shows the column-prepare
and column-finish stages spending 3-4x their fundamental HBM traffic:
the XLA lowering of the four-step factor-matmul FFT materialises every
stage ([c, yN] complex, ~300 MB at 16k) in HBM, with layout copies
between. This kernel runs both factor matmuls and the twiddle multiply
per row-tile inside VMEM — one read and one write of the data.

Mosaic cannot shape-cast across the lane dimension, so the kernel works
on the ``[rows, n1, n2]`` factored view (the caller reshapes, which is
free at the XLA level for row-major data): input element ``(r, a, b)``
is row position ``a*n2 + b``; output element ``(r, d, c)`` is transform
position ``d*n1 + c``. In-kernel data movement is limited to last-two
axis swaps and leading-dim merges, which Mosaic lowers natively.

:func:`fused_prepare_rows` / :func:`fused_finish_rows` wrap the kernel
with the engine's window/pad/phase/gather pre/post steps (cheap fused
XLA elementwise passes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _is_tpu, _karatsuba, _sds

__all__ = ["fused_prepare_rows", "fused_finish_rows",
           "four_step_pallas", "permute_positions"]


@functools.lru_cache(maxsize=None)
def _plan_pair(n, inverse, form="tt"):
    """Factor-matmul constants as float-pair numpy, laid out for the
    requested kernel formulation: ``tt`` wants (F1^T, W^T[b,c], F2^T);
    ``ls`` wants (F1[c,a], W[c,b], F2^T) — its stage 1 is a LEFT
    multiply so F1 stays untransposed and the twiddle is applied in
    [c, b] layout."""
    from .fft_mxu import fft_mxu_plan

    # bd's in-register [.., n1, n2] -> [.., n] cast needs a
    # lane-aligned minor factor (see factor_pair); tt/ls transpose per
    # stage and take the balanced split
    plan = fft_mxu_plan(n, inverse, min_n2=128 if form == "bd" else 1)
    if plan is None:
        return None
    n1, n2, F1, W, F2 = plan

    def pair(z):
        z = np.ascontiguousarray(z)
        return (z.real.astype(np.float32), z.imag.astype(np.float32))

    if form in ("ls", "bd"):
        return n1, n2, pair(F1), pair(W), pair(F2.T)
    return n1, n2, pair(F1.T), pair(W.T), pair(F2.T)


def _four_step_tile(xr, xi, f1t, wt, f2t, n1, n2):
    """[TR, n1, n2] pair -> [TR, n2, n1] pair, all in VMEM."""
    TR = xr.shape[0]
    # stage 1: contract a — [TR, a, b] -> [TR, b, a] -> [(TR b), a]
    xr3 = jnp.swapaxes(xr, 1, 2).reshape(-1, n1)
    xi3 = jnp.swapaxes(xi, 1, 2).reshape(-1, n1)
    t1r, t1i = _karatsuba(xr3, xi3, f1t[0], f1t[1])  # [(TR b), c]
    t1r = t1r.reshape(TR, n2, n1)
    t1i = t1i.reshape(TR, n2, n1)
    # twiddle W^T[b, c]
    wr = wt[0][jnp.newaxis]
    wi = wt[1][jnp.newaxis]
    t2r = t1r * wr - t1i * wi
    t2i = t1r * wi + t1i * wr
    # stage 2: contract b — [TR, b, c] -> [TR, c, b] -> [(TR c), b]
    t2r = jnp.swapaxes(t2r, 1, 2).reshape(-1, n2)
    t2i = jnp.swapaxes(t2i, 1, 2).reshape(-1, n2)
    or_, oi_ = _karatsuba(t2r, t2i, f2t[0], f2t[1])  # [(TR c), d]
    or_ = jnp.swapaxes(or_.reshape(TR, n1, n2), 1, 2)  # [TR, d, c]
    oi_ = jnp.swapaxes(oi_.reshape(TR, n1, n2), 1, 2)
    return or_, oi_


def _four_step_tile_ls(xr, xi, f1, wcb, f2t, n1, n2):
    """[TR, n1, n2] pair -> [TR, n2, n1] pair — the leading-swap
    formulation. The ``tt`` tile does three last-two-axis swaps per
    tile (lane transposes, VPU-bound: the round-3 micro-bench put the
    kernel at <10% of HBM peak). Here stage 1 is a LEFT multiply
    ``F1[c,a] @ [a, TR·b]`` — the contraction axis reaches the MXU via
    two *leading*-dim swaps (sublane-granular tile moves, no lane
    shuffles) — which leaves stage 2 contracting the lane axis
    directly, so only the final output reorder remains a transpose."""
    TR = xr.shape[0]
    # stage 1: [TR, a, b] -> [a, TR, b] -> [a, (TR b)]; left-multiply
    xr3 = jnp.swapaxes(xr, 0, 1).reshape(n1, -1)
    xi3 = jnp.swapaxes(xi, 0, 1).reshape(n1, -1)
    t1r, t1i = _karatsuba(f1[0], f1[1], xr3, xi3)  # [c, (TR b)]
    t1r = jnp.swapaxes(t1r.reshape(n1, TR, n2), 0, 1)  # [TR, c, b]
    t1i = jnp.swapaxes(t1i.reshape(n1, TR, n2), 0, 1)
    # twiddle W[c, b]
    wr = wcb[0][jnp.newaxis]
    wi = wcb[1][jnp.newaxis]
    t2r = t1r * wr - t1i * wi
    t2i = t1r * wi + t1i * wr
    # stage 2: contract b on lanes — no swap needed
    or_, oi_ = _karatsuba(t2r.reshape(-1, n2), t2i.reshape(-1, n2),
                          f2t[0], f2t[1])  # [(TR c), d]
    or_ = jnp.swapaxes(or_.reshape(TR, n1, n2), 1, 2)  # [TR, d, c]
    oi_ = jnp.swapaxes(oi_.reshape(TR, n1, n2), 1, 2)
    return or_, oi_


def _four_step_tile_bd(xr, xi, f1, wcb, f2t, n1, n2, permuted,
                       win=None):
    """[TR, n1, n2] pair -> [TR, n2, n1] pair (or [TR, n1, n2] in
    permuted order) — the batched-left-dot formulation.

    The tt/ls tiles measured identical on chip (3.65 vs 3.69 ms at the
    S1 shape) while a pure-copy kernel runs ~2.6x faster: the cost is
    VPU data movement generally, not lane transposes specifically. This
    tile minimises movement outright: stage 1 is the ls left multiply
    ``F1[c,a] @ [a,(t b)]`` (one leading swap in), the twiddle applies
    in the ``[c, t, b]`` layout it lands in (``W[c,b]`` broadcast over
    t — no post-stage swap), and stage 2 contracts the lane axis
    directly from the same layout. One leading swap out gives
    ``[t, c, d]``; with ``permuted=True`` that is the OUTPUT — flat
    index ``loc = c*n2 + d`` holding transform position
    ``p = d*n1 + c`` — and no lane transpose ever runs. Consumers undo
    the permutation in their own index arithmetic (see
    :func:`permute_positions`); ``permuted=False`` appends the one
    lane transpose for the natural order.
    """
    TR = xr.shape[0]
    if win is not None:
        # fused window: the centre-pad never materialises — the zero
        # rows contribute nothing to the stage-1 contraction, so ``f1``
        # arrives column-sliced to the live rows and the matmul shrinks
        # by the pad fraction
        xr = xr * win[jnp.newaxis]
        xi = xi * win[jnp.newaxis]
    ya = xr.shape[1]
    # stage 1: [TR, a, b] -> [a, (TR b)]; left multiply
    xr3 = jnp.swapaxes(xr, 0, 1).reshape(ya, -1)
    xi3 = jnp.swapaxes(xi, 0, 1).reshape(ya, -1)
    t1r, t1i = _karatsuba(f1[0], f1[1], xr3, xi3)  # [c, (TR b)]
    t1r = t1r.reshape(n1, TR, n2)
    t1i = t1i.reshape(n1, TR, n2)
    # twiddle W[c, b] broadcast over the middle (row) axis — applied in
    # the layout stage 1 produced, no movement
    wr = wcb[0][:, jnp.newaxis, :]
    wi = wcb[1][:, jnp.newaxis, :]
    t2r = t1r * wr - t1i * wi
    t2i = t1r * wi + t1i * wr
    # stage 2: contract b on lanes from the same layout
    or_, oi_ = _karatsuba(t2r.reshape(-1, n2), t2i.reshape(-1, n2),
                          f2t[0], f2t[1])  # [(c TR), d]
    or_ = jnp.swapaxes(or_.reshape(n1, TR, n2), 0, 1)  # [TR, c, d]
    oi_ = jnp.swapaxes(oi_.reshape(n1, TR, n2), 0, 1)
    if not permuted:
        or_ = jnp.swapaxes(or_, 1, 2)  # [TR, d, c] natural order
        oi_ = jnp.swapaxes(oi_, 1, 2)
    return or_, oi_


def permute_positions(ix, n1, n2):
    """Map natural transform positions ``p = d*n1 + c`` to their flat
    location ``c*n2 + d`` in a ``permuted=True`` bd-form output (works
    on numpy or traced int arrays)."""
    return (ix % n1) * n2 + ix // n1


def pad_spec_aligned(n, lo, yB, inverse):
    """True when the centre-pad geometry lands on whole factored rows
    (lo and yB multiples of the plan's n2), i.e. the bd kernel can fuse
    the window+pad into its input DMA."""
    plan = _plan_pair(n, inverse, "bd")
    if plan is None:
        return False
    n2 = plan[1]
    return lo % n2 == 0 and yB % n2 == 0


def _fourstep_kernel(n1, n2, with_phase, form, permuted, with_win,
                     xr_ref, xi_ref, f1tr_ref, f1ti_ref, wtr_ref,
                     wti_ref, f2tr_ref, f2ti_ref, *rest):
    win = None
    if with_win:
        win_ref, rest = rest[0], rest[1:]
        win = win_ref[:]
    if with_phase:
        phr_ref, phi_ref, or_ref, oi_ref = rest
    else:
        or_ref, oi_ref = rest
    consts = (
        (f1tr_ref[:], f1ti_ref[:]),
        (wtr_ref[:], wti_ref[:]),
        (f2tr_ref[:], f2ti_ref[:]),
    )
    if form == "bd":
        tr, ti = _four_step_tile_bd(xr_ref[0], xi_ref[0], *consts,
                                    n1, n2, permuted, win=win)
    else:
        tile = _four_step_tile_ls if form == "ls" else _four_step_tile
        tr, ti = tile(xr_ref[0], xi_ref[0], *consts, n1, n2)
    if with_phase:
        # [n2, n1] natural output order, or [n1, n2] when permuted —
        # the caller lays the phase out to match
        phr = phr_ref[0, 0]
        phi = phi_ref[0, 0]
        or_ref[0] = tr * phr[jnp.newaxis] - ti * phi[jnp.newaxis]
        oi_ref[0] = tr * phi[jnp.newaxis] + ti * phr[jnp.newaxis]
    else:
        or_ref[0] = tr
        oi_ref[0] = ti


def four_step_pallas(x, inverse, phase=None, tile_rows=32,
                     interpret=None, as_pair=False, form=None,
                     permuted=False, pad_spec=None):
    """Fused four-step transform along the last axis of ``x``.

    Matches :func:`.fft_mxu.fft_mxu` (centre-zero shift convention) but
    runs both factor matmuls and the twiddle inside VMEM per row-tile.

    :param x: complex [F, rows, n] (row-major; n must factor)
    :param phase: optional complex [F, n] multiplied into the output
        (per-facet image-space phases; always given in natural
        position order — the permuted mode re-lays it out internally)
    :param form: tile formulation — ``"tt"`` (transpose per stage),
        ``"ls"`` (leading-swap, one lane transpose per tile) or
        ``"bd"`` (batched-left-dot, no lane transpose when permuted);
        default from ``SWIFTLY_FFT_FORM``
    :param permuted: bd only — return the output in its in-kernel
        ``loc = (p % n1)*n2 + p//n1`` order, skipping the final lane
        transpose; consumers remap indices via
        :func:`permute_positions`
    :param pad_spec: bd only — ``(n, lo, fb)``: ``x`` is the UNPADDED
        [F, rows, yB] block, logically windowed by real ``fb`` [yB] and
        centre-embedded at offset ``lo`` of an ``n``-long zero axis.
        Neither the window product nor the pad ever materialises: the
        kernel windows the tile in VMEM and contracts the live rows
        against a column-sliced F1 (zero rows contribute nothing).
        Requires ``lo`` and ``yB`` to be multiples of the plan's n2 —
        callers check :func:`pad_spec_aligned` and fall back.
    :return: complex64 [F, rows, n]
    """
    if interpret is None:
        interpret = not _is_tpu()
    if form is None:
        form = os.environ.get("SWIFTLY_FFT_FORM", "tt")
    if form not in ("tt", "ls", "bd"):
        raise ValueError(f"Unknown four-step formulation: {form}")
    if permuted and form != "bd":
        raise ValueError("permuted output requires form='bd'")
    if pad_spec is not None and form != "bd":
        raise ValueError("pad_spec requires form='bd'")
    n = x.shape[-1] if pad_spec is None else pad_spec[0]
    plan = _plan_pair(n, inverse, form)
    if plan is None:
        raise ValueError(f"no four-step factorisation for n={n}")
    n1, n2, f1t, wt, f2t = plan

    def split(z):
        if isinstance(z, tuple):
            return z
        return (jnp.real(z).astype(jnp.float32),
                jnp.imag(z).astype(jnp.float32))

    xr, xi = split(x)
    F, rows = xr.shape[0], xr.shape[1]
    fb_win = None
    if pad_spec is not None:
        _, lo, fb = pad_spec
        yB = xr.shape[-1]
        if lo % n2 or yB % n2:
            raise ValueError(
                f"pad_spec misaligned: lo={lo}, yB={yB}, n2={n2}"
            )
        ya = yB // n2
        a_lo = lo // n2
        f1t = (f1t[0][:, a_lo:a_lo + ya], f1t[1][:, a_lo:a_lo + ya])
        fb_win = jnp.asarray(fb, jnp.float32).reshape(ya, n2)
        xr = xr.reshape(F, rows, ya, n2)
        xi = xi.reshape(F, rows, ya, n2)
    else:
        ya = n1
        xr = xr.reshape(F, rows, n1, n2)
        xi = xi.reshape(F, rows, n1, n2)
    TR = min(tile_rows, rows)
    # VMEM model: in/out pairs double-buffered + two stage pairs + the
    # Karatsuba bf16 splits — ~20 f32-equivalent copies of the tile
    # (calibrated: Mosaic reported 21.39M at TR=32, n=8192). The scoped
    # budget can be raised past Mosaic's ~16M default via
    # vmem_limit_bytes (v5e has 128M physical) — fatter tiles amortise
    # the per-grid-step overhead that dominates at TR=16.
    # SWIFTLY_FFT_VMEM (MB) / SWIFTLY_FFT_TR sweep these on hardware.
    budget = int(os.environ.get("SWIFTLY_FFT_VMEM", "14")) * 10**6
    tr_env = os.environ.get("SWIFTLY_FFT_TR")
    if tr_env:
        TR = min(int(tr_env), rows)
    while TR > 8 and 4 * n * TR * 20 > budget:
        TR //= 2
    grid = (F, pl.cdiv(rows, TR))
    ms = pl.ANY if interpret else pltpu.VMEM

    x_spec = pl.BlockSpec((1, TR, ya, n2), lambda f, t: (f, t, 0, 0),
                          memory_space=ms)
    c1 = pl.BlockSpec((n1, ya), lambda f, t: (0, 0), memory_space=ms)
    w_shape = (n1, n2) if form in ("ls", "bd") else (n2, n1)
    cw = pl.BlockSpec(w_shape, lambda f, t: (0, 0), memory_space=ms)
    c2 = pl.BlockSpec((n2, n2), lambda f, t: (0, 0), memory_space=ms)
    out_tail = (n1, n2) if permuted else (n2, n1)
    o_spec = pl.BlockSpec((1, TR) + out_tail, lambda f, t: (f, t, 0, 0),
                          memory_space=ms)
    args = [xr, xi,
            jnp.asarray(f1t[0]), jnp.asarray(f1t[1]),
            jnp.asarray(wt[0]), jnp.asarray(wt[1]),
            jnp.asarray(f2t[0]), jnp.asarray(f2t[1])]
    in_specs = [x_spec, x_spec, c1, c1, cw, cw, c2, c2]
    if fb_win is not None:
        args.append(fb_win)
        in_specs.append(
            pl.BlockSpec((ya, n2), lambda f, t: (0, 0), memory_space=ms)
        )
    if phase is not None:
        phr, phi = split(phase)
        if permuted:
            # [c, d] layout: location loc = c*n2 + d holds position
            # p = d*n1 + c
            loc = jnp.arange(n, dtype=jnp.int32)
            idx = (loc % n2) * n1 + loc // n2
            phr = jnp.take(phr, idx, axis=-1)
            phi = jnp.take(phi, idx, axis=-1)
        # natural mode: phase over positions p = d*n1 + c -> [n2, n1]
        args += [phr.reshape((F, 1) + out_tail),
                 phi.reshape((F, 1) + out_tail)]
        ph_spec = pl.BlockSpec(
            (1, 1) + out_tail, lambda f, t: (f, 0, 0, 0),
            memory_space=ms
        )
        in_specs += [ph_spec, ph_spec]
    kernel = functools.partial(_fourstep_kernel, n1, n2,
                               phase is not None, form, permuted,
                               fb_win is not None)
    outr, outi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[o_spec, o_spec],
        out_shape=[_sds((F, rows) + out_tail, xr),
                   _sds((F, rows) + out_tail, xr)],
        cost_estimate=pl.CostEstimate(
            flops=6 * F * rows * n * (n1 + n2),
            bytes_accessed=4 * 4 * F * rows * n,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=min(int(budget * 1.4), 120 * 10**6),
        ),
        interpret=interpret,
    )(*args)
    if as_pair:
        return outr.reshape(F, rows, n), outi.reshape(F, rows, n)
    out = jax.lax.complex(outr, outi)
    return out.reshape(F, rows, n)


def fused_prepare_rows(rows, Fb_yB, phase, yN, tile_rows=32,
                       interpret=None, as_pair=False, form=None):
    """Window + centre-pad + four-step inverse DFT + per-facet phase.

    Matches ``prepare_facet_op(rows, off, axis=-1)`` with the facet
    phase supplied as a precomputed vector (offsets are static facet
    metadata; host f64 phases are *more* accurate than the traced f32
    ``_phase`` computation — measured 9e-6 vs 8e-5 relative at yN=512).

    :param rows: complex [F, c, yB]
    :param Fb_yB: real [yB] window (``extract_mid(Fb, yB)``)
    :param phase: complex [F, yN]
    :return: complex64 [F, c, yN]
    """
    F, c, yB = rows.shape
    lo = yN // 2 - yB // 2
    if form is None:
        form = os.environ.get("SWIFTLY_FFT_FORM", "tt")
    if form == "bd" and pad_spec_aligned(yN, lo, yB, True):
        # window+pad fused into the kernel's input DMA: the [F, c, yN]
        # padded intermediate never touches HBM and stage 1 contracts
        # only the live yB rows
        return four_step_pallas(
            rows, inverse=True, phase=phase, tile_rows=tile_rows,
            interpret=interpret, as_pair=as_pair, form="bd",
            pad_spec=(yN, lo, Fb_yB),
        )
    fb = jnp.asarray(Fb_yB, jnp.float32)
    win = rows * fb[jnp.newaxis, jnp.newaxis, :].astype(rows.dtype)
    padded = jnp.pad(win, ((0, 0), (0, 0), (lo, yN - yB - lo)))
    return four_step_pallas(padded, inverse=True, phase=phase,
                            tile_rows=tile_rows, interpret=interpret,
                            as_pair=as_pair, form=form)


def fused_finish_rows(x, Fb_yB, facet_offs, masks, yB, tile_rows=32,
                      interpret=None, form=None):
    """Four-step forward DFT + wrap-window gather at the facet offset +
    ``Fb`` window + mask: the engine's axis-1 ``finish_facet``.

    :param x: complex [F, c, yN]
    :param Fb_yB: real [yB] window
    :param facet_offs: int32 [F] facet offsets (traced ok)
    :param masks: real [F, yB] boundary masks
    :return: complex64 [F, c, yB]
    """
    F, c, yN = x.shape
    if form is None:
        form = os.environ.get("SWIFTLY_FFT_FORM", "tt")
    # bd: take the output in permuted order and fold the permutation
    # into the wrap-window gather indices — the final lane transpose
    # never runs and the gather costs the same
    permuted = form == "bd"
    g = four_step_pallas(x, inverse=False, tile_rows=tile_rows,
                         interpret=interpret, form=form,
                         permuted=permuted)
    starts = jnp.mod(
        yN // 2 - yB // 2
        + jnp.asarray(facet_offs, jnp.int32)[:, jnp.newaxis]
        + jnp.arange(yB, dtype=jnp.int32)[jnp.newaxis, :],
        yN,
    )  # [F, yB]
    if permuted:
        n1, n2 = _plan_pair(yN, False, form)[:2]
        starts = permute_positions(starts, n1, n2)
    w = jax.vmap(lambda gf, ix: jnp.take(gf, ix, axis=1))(g, starts)
    fb = jnp.asarray(Fb_yB, jnp.float32)
    w = w * fb[jnp.newaxis, jnp.newaxis, :].astype(w.dtype)
    return w * jnp.asarray(masks)[:, jnp.newaxis, :].astype(w.dtype)
