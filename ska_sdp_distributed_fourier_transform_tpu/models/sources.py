"""Point-source sky models — the mathematical accuracy oracle.

The whole test strategy of the SwiFTly algorithm rests on point-source lists
for which both the image-plane facet (pixel placement) and the uv-plane
subgrid (direct DFT) have closed-form ground truth, for *any* tile offset
(reference semantics:
`/root/reference/src/ska_sdp_exec_swiftly/fourier_transform/fourier_algorithm.py:218-344`).

These run on the host in float64 numpy — they are oracles and workload
generators, not device code. The DFT is vectorised over sources (the
reference loops per source).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "make_facet_from_sources",
    "make_subgrid_from_sources",
    "generate_masks",
]


def make_facet_from_sources(
    sources,
    image_size: int,
    facet_size: int,
    facet_offsets,
    facet_masks=None,
):
    """Generate a facet tile from a source list by pixel placement.

    Each source is an ``(intensity, *coords)`` tuple with integer image
    coordinates relative to the image centre; coordinates wrap modulo
    ``image_size``. The number of offsets given determines dimensionality.

    :param sources: list of ``(intensity, *coords)`` tuples
    :param image_size: full image size N (coordinates interpreted mod N)
    :param facet_size: tile size per axis
    :param facet_offsets: tile mid-point offset per axis
    :param facet_masks: optional per-axis 1-D mask arrays
    :return: complex128 numpy array of shape ``dims * [facet_size]``
    """
    dims = len(facet_offsets)
    facet = np.zeros(dims * [facet_size], dtype=complex)

    origin = np.array(facet_offsets, dtype=int) - facet_size // 2
    for intensity, *coord in sources:
        rel = np.mod(np.array(coord, dtype=int) - origin, image_size)
        if np.any((rel < 0) | (rel >= facet_size)):
            continue
        facet[tuple(rel)] += intensity

    for axis, mask in enumerate(facet_masks or []):
        if mask is not None:
            shape = [1] * dims
            shape[axis] = -1
            facet *= np.reshape(np.asarray(mask), shape)
    return facet


def make_subgrid_from_sources(
    sources,
    image_size: int,
    subgrid_size: int,
    subgrid_offsets,
    subgrid_masks=None,
):
    """Generate a subgrid tile by direct Fourier transform of the sources.

    This is the accuracy oracle: ``sg[u] = sum_s I_s/N^d exp(2 pi i u.x_s / N)``
    evaluated on the tile's uv coordinate window
    ``[off - size//2, off + (size+1)//2)`` per axis.

    :param sources: list of ``(intensity, *coords)`` tuples
    :param image_size: full image size N (sets resolution + normalisation)
    :param subgrid_size: tile size per axis
    :param subgrid_offsets: tile mid-point offset per axis
    :param subgrid_masks: optional per-axis 1-D mask arrays
    :return: complex128 numpy array of shape ``dims * [subgrid_size]``
    """
    dims = len(subgrid_offsets)
    subgrid = np.zeros(dims * [subgrid_size], dtype=complex)

    # Per-axis uv coordinate vectors of the tile window.
    axis_coords = [
        np.arange(off - subgrid_size // 2, off + (subgrid_size + 1) // 2)
        for off in subgrid_offsets
    ]

    if sources:
        intensities = np.array([s[0] for s in sources], dtype=float)
        coords = np.array([list(s[1:]) for s in sources], dtype=float)
        norm = intensities / float(image_size) ** dims
        # Separable phase: prod_d exp(2 pi i u_d x_d / N). Accumulate per
        # source via an outer product over axes (vectorised over sources).
        for inten, xs in zip(norm, coords):
            term = np.array(inten, dtype=complex)
            for d in range(dims):
                phase = np.exp(
                    (2j * np.pi / image_size) * axis_coords[d] * xs[d]
                )
                term = np.multiply.outer(term, phase)
            subgrid += term

    for axis, mask in enumerate(subgrid_masks or []):
        if mask is not None:
            shape = [1] * dims
            shape[axis] = -1
            subgrid *= np.reshape(np.asarray(mask), shape)
    return subgrid


def generate_masks(N, mask_size, offsets):
    """Partition-of-unity boundary masks for a 1-D tile cover.

    For each offset, produce a 0/1 mask of length ``mask_size`` selecting the
    pixels this tile owns: boundaries halfway to the neighbouring offsets
    (wrapping at N).

    :param N: full image size
    :param mask_size: tile mask length (xA_size or yB_size)
    :param offsets: 1-D integer array of tile offsets
    :return: int array of shape ``(len(offsets), mask_size)``
    """
    offsets = np.asarray(offsets)
    mask = np.zeros((len(offsets), mask_size), dtype=int)
    border = (offsets + np.hstack([offsets[1:], [N + offsets[0]]])) // 2
    for i, offset in enumerate(offsets):
        left = (border[i - 1] - offset + mask_size // 2) % N
        right = border[i] - offset + mask_size // 2
        if not left >= 0 and right <= mask_size:
            raise ValueError(
                "Mask size not large enough to cover subgrids / facets!"
            )
        mask[i, left:right] = 1
    return mask
