"""Task bodies and cover/mask helpers for the streaming API.

These are the graph-node work functions of the reference
(`/root/reference/src/ska_sdp_exec_swiftly/api_helper.py`), re-expressed as
pure functions over JAX arrays. Where the reference mutates accumulators
in-place (``out=`` + "do not reuse the parameter"), these return fresh
functional values — XLA's buffer donation/fusion recovers the in-place
update without the aliasing hazard the reference has to document around.
"""

from __future__ import annotations

import numpy as np

from .models import make_facet_from_sources, make_subgrid_from_sources

__all__ = [
    "make_subgrid",
    "make_facet",
    "check_facet",
    "check_residual",
    "check_subgrid",
    "sum_and_finish_subgrid",
    "prepare_and_split_subgrid",
    "accumulate_column",
    "accumulate_facet",
    "finish_facet",
    "extract_column",
    "make_full_cover_config",
    "make_mask_from_slice",
]


# ------------------------------------------------------------------ oracles


def make_subgrid(image_size, sg_config, sources):
    """Ground-truth subgrid for a tile config (direct DFT oracle)."""
    return make_subgrid_from_sources(
        sources,
        image_size,
        sg_config.size,
        [sg_config.off0, sg_config.off1],
        [sg_config.mask0, sg_config.mask1],
    )


def make_facet(image_size, facet_config, sources):
    """Ground-truth facet for a tile config (pixel-placement oracle)."""
    return make_facet_from_sources(
        sources,
        image_size,
        facet_config.size,
        [facet_config.off0, facet_config.off1],
        [facet_config.mask0, facet_config.mask1],
    )


def check_facet(image_size, facet_config, approx_facet, sources):
    """RMSE of an approximate facet against the oracle."""
    facet = make_facet(image_size, facet_config, sources)
    return np.sqrt(np.average(np.abs(facet - np.asarray(approx_facet)) ** 2))


def check_residual(residual_facet):
    """RMSE of a residual image."""
    return np.sqrt(np.average(np.abs(np.asarray(residual_facet)) ** 2))


def check_subgrid(image_size, sg_config, approx_subgrid, sources):
    """RMSE of an approximate subgrid against the DFT oracle."""
    approx_subgrid = np.asarray(approx_subgrid)
    subgrid = make_subgrid_from_sources(
        sources,
        image_size,
        approx_subgrid.shape[0],
        [sg_config.off0, sg_config.off1],
        [sg_config.mask0, sg_config.mask1],
    )
    return np.sqrt(np.average(np.abs(subgrid - approx_subgrid) ** 2))


# ------------------------------------------------------------- task bodies


def sum_and_finish_subgrid(core, NMBF_NMBFs, facets_config_list,
                           subgrid_config):
    """Sum facet contributions into a finished, masked subgrid.

    Groups facets by column (off1) so the axis-1 transform runs once per
    distinct off1 rather than once per facet (reference:
    api_helper.py:73-112).
    """
    summed = None
    for off1 in sorted({cfg.off1 for cfg in facets_config_list}):
        summed_col = None
        for facet_config, NMBF_NMBF in zip(facets_config_list, NMBF_NMBFs):
            if facet_config.off1 != off1:
                continue
            summed_col = core.add_to_subgrid(
                NMBF_NMBF, facet_config.off0, axis=0, out=summed_col
            )
        summed = core.add_to_subgrid(summed_col, off1, axis=1, out=summed)

    result = core.finish_subgrid(
        summed,
        [subgrid_config.off0, subgrid_config.off1],
        subgrid_config.size,
    )
    if subgrid_config.mask0 is not None:
        result = result * np.asarray(subgrid_config.mask0)[:, np.newaxis]
    if subgrid_config.mask1 is not None:
        result = result * np.asarray(subgrid_config.mask1)[np.newaxis, :]
    return result


def prepare_and_split_subgrid(core, subgrid, subgrid_offs,
                              facets_config_list):
    """Prepare a subgrid and extract its contribution to every facet,
    deduplicating the axis-0 extraction across facets sharing off0
    (reference: api_helper.py:115-139)."""
    prepared = core.prepare_subgrid(subgrid, subgrid_offs)

    NAF_AFs = {
        off0: core.extract_from_subgrid(prepared, off0, axis=0)
        for off0 in {cfg.off0 for cfg in facets_config_list}
    }
    return [
        core.extract_from_subgrid(
            NAF_AFs[cfg.off0], cfg.off1, axis=1
        )
        for cfg in facets_config_list
    ]


def accumulate_column(core, NAF_NAF, NAF_MNAF, subgrid_off1):
    """Fold one subgrid's contribution into the per-column facet
    accumulator (functional; reference does this in-place,
    api_helper.py:142-152)."""
    return core.add_to_facet(NAF_NAF, subgrid_off1, axis=1, out=NAF_MNAF)


def accumulate_facet(core, NAF_MNAF, MNAF_BMNAF, facet_config, sg_off0):
    """Finish a column along axis 1 and fold it into the facet
    accumulator (reference: api_helper.py:155-179)."""
    NAF_BMNAF = core.finish_facet(
        NAF_MNAF, facet_config.off1, facet_config.size, axis=1
    )
    if facet_config.mask1 is not None:
        NAF_BMNAF = NAF_BMNAF * np.asarray(facet_config.mask1)[np.newaxis, :]
    return core.add_to_facet(NAF_BMNAF, sg_off0, axis=0, out=MNAF_BMNAF)


def finish_facet(core, MNAF_BMNAF, facet_config):
    """Finish a facet along axis 0 and apply its mask. A column that never
    received contributions yields a zero facet (the reference's None path
    references a non-existent attribute; fixed here)."""
    if MNAF_BMNAF is None:
        return np.zeros(
            (facet_config.size, facet_config.size), dtype=complex
        )
    approx = core.finish_facet(
        MNAF_BMNAF, facet_config.off0, facet_config.size, axis=0
    )
    if facet_config.mask0 is not None:
        approx = approx * np.asarray(facet_config.mask0)[:, np.newaxis]
    return approx


def extract_column(core, BF_F, subgrid_off0, facet_off1):
    """Column step: extract along axis 0, prepare along axis 1
    (reference: api_helper.py:200-210). The axis-1 prepare is the dominant
    per-column cost and is what the forward LRU amortises."""
    return core.prepare_facet(
        core.extract_from_facet(BF_F, subgrid_off0, axis=0),
        facet_off1,
        axis=1,
    )


# ------------------------------------------------------------------ covers


def _axis_cover(N, chunk_size):
    """Per-axis tile cover: (offset, in-tile mask slice) pairs.

    Tiles sit at multiples of ``chunk_size``; each owns the pixels up to
    the halfway border with its neighbours (cyclically), expressed as one
    slice in tile-local coordinates (semantics per reference
    api_helper.py:213-240; vectorised construction).
    """
    n_tiles = -(-N // chunk_size)
    offs = chunk_size * np.arange(n_tiles)
    nxt = np.roll(offs, -1)
    nxt[-1] += N  # cyclic successor of the last tile
    hi_border = (offs + nxt) // 2
    lo_border = np.roll(hi_border, 1)  # previous tile's upper border
    half = chunk_size // 2
    lo = (lo_border - offs + half) % N
    hi = hi_border - offs + half
    return [
        (int(o), [[slice(int(a), int(b))], int(chunk_size)])
        for o, a, b in zip(offs, lo, hi)
    ]


def make_full_cover_config(N, chunk_size, cls):
    """Full-image 2-D tile cover as the outer product of the per-axis
    cover — every pixel in exactly one tile (partition of unity)."""
    axis = _axis_cover(N, chunk_size)
    return [
        cls(off0, off1, int(chunk_size), mask0, mask1)
        for off0, mask0 in axis
        for off1, mask1 in axis
    ]


def make_mask_from_slice(slice_list, mask_size):
    """Materialise a 0/1 mask vector from a list of slices."""
    mask = np.zeros((mask_size,))
    for sl in slice_list:
        mask[sl] = 1
    return mask
