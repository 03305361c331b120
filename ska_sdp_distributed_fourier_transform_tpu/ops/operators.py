"""Operator-algebra (MXU) formulation of the SwiFTly processing functions.

Every per-axis SwiFTly op is a *linear operator* along that axis. For the
contribution-rate sizes (xM_yN and xM — 128..2048 in the catalogue), the
TPU-native way to apply them is not an FFT lowering (VPU-bound, poorly
shaped for the hardware) but a **precomputed dense operator matrix applied
as a matmul on the MXU**: the window multiply, centre-pad/extract and
phase rolls all fold into the operator, so a whole op chain is one
contraction at MXU throughput. The classic n²/(n log n) FLOP penalty is a
win for small n on a systolic array, and two-axis ops become the
sandwich ``Op0 @ X @ Op1ᵀ`` — exactly the batched-matmul shape XLA tiles
best.

The facet-scale ops (yN up to 64k) stay on the FFT path in
:mod:`.core` — dense operators would be O(yN²).

Operators are built host-side (numpy, float64) from the same semantics as
the reference ops (core.py:255-285, :287-325, :328-368, :370-406) and are
exact: ``add_to_subgrid_fn(x, off) == add_to_subgrid_operator(off) @ x``
to rounding.

Offset dependence factors as index rolls of a base operator, so per-tile
operator variants are cheap data movement, not rebuilds.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "shifted_dft_matrix",
    "shifted_idft_matrix",
    "add_to_subgrid_operator",
    "extract_from_subgrid_operator",
    "finish_subgrid_operator",
    "prepare_subgrid_operator",
    "prepare_facet_operator",
    "finish_facet_operator",
]


def _md(x, n):
    return np.mod(x, n)


def shifted_dft_matrix(n: int) -> np.ndarray:
    """Matrix of the centre-zero DFT: ``fft(x) == F @ x`` (complex128).

    F[j, p] = exp(-2πi (j - n//2)(p - n//2) / n).
    """
    k = np.arange(n) - n // 2
    return np.exp(-2j * np.pi * np.outer(k, k) / n)


def shifted_idft_matrix(n: int) -> np.ndarray:
    """Matrix of the centre-zero inverse DFT: ``ifft(x) == Fi @ x``."""
    return np.conj(shifted_dft_matrix(n)) / n


def _scaled(off, N, size):
    # off * size // N with floor semantics (reference formula); exact for
    # aligned offsets
    return int(np.floor_divide(off * size, N))


def add_to_subgrid_operator(N, xM, xM_yN, Fn, facet_off) -> np.ndarray:
    """[xM, xM_yN] operator: NMBF -> subgrid-padded term.

    Folds fft + roll(-s) + Fn-window + pad_mid + roll(+s)
    (reference core.py:255-285) into one matrix.
    """
    m = xM_yN
    s = _scaled(facet_off, N, xM)
    F = shifted_dft_matrix(m)
    # row k of the windowed spectrum selects shifted-DFT row (k + s) mod m
    # (roll(fft(x), -s)[k] == F[(k + s) mod m] @ x)
    rows = _md(np.arange(m) + s, m)
    U = Fn[:, None] * F[rows]  # [m, m]
    out = np.zeros((xM, m), dtype=np.complex128)
    q = _md(xM // 2 - m // 2 + np.arange(m) + s, xM)
    out[q] = U
    return out


def extract_from_subgrid_operator(N, xM, xM_yN, Fn, facet_off) -> np.ndarray:
    """[xM_yN, xM] operator: FS -> NAF.

    Folds wrap-window gather + Fn-window + roll(+s) + ifft
    (reference core.py:370-406).
    """
    m = xM_yN
    s = _scaled(facet_off, N, xM)
    Fi = shifted_idft_matrix(m)
    # ifft input R[p]: R[p] = Fn[k] * FS[j], k = (p - s) mod m,
    # j = (xM//2 - m//2 + k + s) mod xM
    k = _md(np.arange(m) - s, m)
    j = _md(xM // 2 - m // 2 + k + s, xM)
    sel = np.zeros((m, xM), dtype=np.complex128)
    sel[np.arange(m), j] = Fn[k]
    return Fi @ sel


def finish_subgrid_operator(xM, xA, subgrid_off) -> np.ndarray:
    """[xA, xM] operator: summed contributions -> subgrid samples along one
    axis (reference core.py:287-325: ifft + wrap-window gather at -off)."""
    Fi = shifted_idft_matrix(xM)
    rows = _md(xM // 2 - xA // 2 + np.arange(xA) + subgrid_off, xM)
    return Fi[rows]


def prepare_subgrid_operator(xM, xA, subgrid_off) -> np.ndarray:
    """[xM, xA] operator: subgrid -> FS along one axis
    (reference core.py:328-368: pad_mid + roll(+off) + fft)."""
    F = shifted_dft_matrix(xM)
    cols = _md(xM // 2 - xA // 2 + np.arange(xA) + subgrid_off, xM)
    return F[:, cols]


def prepare_facet_operator(N, yN, Fb, yB, facet_off) -> np.ndarray:
    """[yN, yB] operator: facet -> BF along one axis (reference
    core.py:189-222: Fb-window + pad_mid + roll(+off) + ifft). Only
    economical for small yN; the engine default is the FFT path."""
    Fi = shifted_idft_matrix(yN)
    fb_lo = (yN - 1) // 2 - yB // 2
    fb = Fb[fb_lo : fb_lo + yB]
    cols = _md(yN // 2 - yB // 2 + np.arange(yB) + facet_off, yN)
    return Fi[:, cols] * fb[None, :]


def finish_facet_operator(N, yN, Fb, yB, facet_off) -> np.ndarray:
    """[yB, yN] operator: accumulated contributions -> facet along one axis
    (reference core.py:452-484: fft + wrap-window gather at -off +
    Fb-window)."""
    F = shifted_dft_matrix(yN)
    fb_lo = (yN - 1) // 2 - yB // 2
    fb = Fb[fb_lo : fb_lo + yB]
    rows = _md(yN // 2 - yB // 2 + np.arange(yB) + facet_off, yN)
    return fb[:, None] * F[rows]
