"""Sparse facet covers: facets covering only a circular field of view.

The reference ships this as script-level helpers
(`/root/reference/scripts/demo_sparse_facet.py:34-150`); here it is part
of the library. A sparse cover places facet tiles row by row so that a
circular FoV of diameter ``fov_pixel`` is covered, instead of tiling the
whole image — for wide images with a small FoV this cuts facet count and
memory by the area ratio.

Offsets are expressed mod N (the reference convention: "left"/"down"
offsets appear as ``N - off``). Every offset must be a multiple of the
facet offset step ``N // xM_size``; misaligned covers are rejected.
"""

from __future__ import annotations

import numpy as np

from .api import FacetConfig

__all__ = [
    "calc_off0_per_row",
    "calc_nfacet_and_off1",
    "fov_sparse_cover_off_mask",
    "make_sparse_facet_cover",
]


def calc_off0_per_row(facet_size, nfacet, N):
    """Offsets (axis 0) of the ``nfacet`` facets of one row, centred on
    the image centre (reference demo_sparse_facet.py:34-60).

    Even counts straddle the centre at ``±facet_size/2``; odd counts put
    one facet at offset 0. Negative positions wrap to ``N - off``.
    """
    if nfacet % 2 == 0:
        first = facet_size // 2
        pairs = nfacet // 2
    else:
        first = facet_size
        pairs = (nfacet - 1) // 2

    off_list = [] if nfacet % 2 == 0 else [0]
    for i in range(pairs):
        right = first + i * facet_size if nfacet % 2 == 0 else \
            (i + 1) * facet_size
        off_list.append(right)
        off_list.append(N - right)
    return off_list


def calc_nfacet_and_off1(facet_size, fov_size, N):
    """Rows needed to cover a circular FoV: for each row offset (axis 1),
    the facet count that spans the circle's chord at that height
    (reference demo_sparse_facet.py:63-103).

    :return: list of ``(nfacet, off1)`` tuples
    """
    n_rows = int(np.ceil(fov_size / facet_size))
    rows = []

    def chord(off1):
        # width of the circular FoV at the row centre
        h = off1 - facet_size / 2
        return 2 * np.sqrt(max((fov_size / 2) ** 2 - h**2, 0.0))

    if n_rows % 2 == 0:
        first = facet_size // 2
        for i in range(n_rows // 2):
            off1 = first + i * facet_size
            largest = fov_size if i == 0 else chord(off1)
            nfacet = int(np.ceil(largest / facet_size))
            rows.append((nfacet, off1))
            rows.append((nfacet, N - off1))
    else:
        rows.append((n_rows, 0))
        for i in range(1, (n_rows + 1) // 2):
            off1 = i * facet_size
            nfacet = int(np.ceil(chord(off1) / facet_size))
            rows.append((nfacet, off1))
            rows.append((nfacet, N - off1))
    return rows


def fov_sparse_cover_off_mask(swiftlyconfig, fov_pixel, x=0, y=0):
    """Facet offsets + trivial masks covering a circular FoV
    (reference demo_sparse_facet.py:106-134).

    :param swiftlyconfig: :class:`.api.SwiftlyConfig`
    :param fov_pixel: FoV diameter in pixels
    :param x: FoV centre offset along axis 0
    :param y: FoV centre offset along axis 1
    :return: ``(off_list, mask_list)`` — offsets validated against
        ``facet_off_step``
    """
    N = swiftlyconfig.image_size
    facet_size = swiftlyconfig.max_facet_size
    off_list = [
        (off0 + x, off1 + y)
        for nfacet, off1 in calc_nfacet_and_off1(facet_size, fov_pixel, N)
        for off0 in calc_off0_per_row(facet_size, nfacet, N)
    ]
    mask_list = [
        ([[slice(None)], facet_size], [[slice(None)], facet_size])
        for _ in off_list
    ]

    step = swiftlyconfig.facet_off_step
    for off0, off1 in off_list:
        if off0 % step != 0 or off1 % step != 0:
            raise ValueError(
                f"Sparse cover offset ({off0}, {off1}) not a multiple of "
                f"the facet offset step {step}"
            )
    return off_list, mask_list


def make_sparse_facet_cover(swiftlyconfig, fov_pixel, x=0, y=0):
    """Build the sparse :class:`.api.FacetConfig` list for a circular FoV
    (reference demo_sparse_facet.py:137-150 composed with :106-134)."""
    off_list, mask_list = fov_sparse_cover_off_mask(
        swiftlyconfig, fov_pixel, x, y
    )
    facet_size = swiftlyconfig.max_facet_size
    return [
        FacetConfig(off0, off1, facet_size, mask0, mask1)
        for (off0, off1), (mask0, mask1) in zip(off_list, mask_list)
    ]
