"""Prolate-spheroidal wave function (PSWF) window constants.

The PSWF window is what makes facet->subgrid contributions compact with
controllable approximation error (see VLA Scientific Memoranda 129/131/132).
Two derived constant vectors drive the whole algorithm (reference semantics:
`/root/reference/src/ska_sdp_exec_swiftly/fourier_transform/core.py:104-150`):

* ``Fb`` — grid-correction, applied to facets: ``1 / pswf[1:]`` (length
  ``yN_size - 1``; the first sample sits at coordinate -1 where the PSWF is
  zero);
* ``Fn`` — the window resampled to the contribution rate: every
  ``N // xM_size``-th PSWF sample starting at ``(yN_size//2) % (N//xM_size)``
  (length ``xM_yN_size``).

Everything here is host-side float64 numpy computed once at setup — the
vectors are tiny and become device constants of whatever dtype the engine
runs in.
"""

from __future__ import annotations

import numpy as np
import scipy.special

__all__ = ["pswf_values", "make_window_constants"]


def _coordinates(n: int) -> np.ndarray:
    """Length-n float64 coordinate vector spanning [-0.5, 0.5), 0 at n//2."""
    n2 = n // 2
    if n % 2 == 0:
        return np.arange(-n2, n2, dtype=float) / n
    return np.arange(-n2, n2 + 1, dtype=float) / n


def pswf_values(W: float, yN_size: int) -> np.ndarray:
    """Evaluate the zeroth-order PSWF at facet resolution.

    ``pswf[i] = pro_ang1(0, 0, pi*W/2, 2*coordinates(yN_size)[i])`` with the
    NaN at coordinate -1 zapped to 0. Evaluation is chunked to sidestep a
    scipy issue with very large argument arrays.

    :param W: PSWF grid-space support parameter
    :param yN_size: padded facet size (evaluation resolution)
    :return: float64 array of length ``yN_size``
    """
    pswf = np.empty(yN_size, dtype=float)
    coords = 2 * _coordinates(yN_size)
    step = 500
    for i in range(1, yN_size, step):
        pswf[i : i + step] = scipy.special.pro_ang1(
            0, 0, np.pi * W / 2, coords[i : i + step]
        )[0]
    pswf[0] = 0  # value at coordinate -1 is NaN; window is zero there
    return pswf


def make_window_constants(W: float, N: int, xM_size: int, yN_size: int):
    """Compute the (pswf, Fb, Fn) constant vectors.

    :return: tuple of float64 arrays with lengths
        ``(yN_size, yN_size - 1, xM_size * yN_size // N)``
    """
    pswf = pswf_values(W, yN_size)
    Fb = 1 / pswf[1:]
    stride = N // xM_size
    Fn = pswf[(yN_size // 2) % stride :: stride]
    return pswf, Fb, Fn
