"""Sky / workload models: point-source oracles and mask generation."""

from .sources import (
    generate_masks,
    make_facet_from_sources,
    make_subgrid_from_sources,
)

__all__ = [
    "generate_masks",
    "make_facet_from_sources",
    "make_subgrid_from_sources",
]
