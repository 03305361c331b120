"""TPU-native streaming distributed Fourier transform (SwiFTly algorithm).

A from-scratch JAX/XLA/Pallas implementation of the streaming widefield
Fourier transform for radio-interferometry imaging: the image plane is
split into facets, the uv/grid plane into subgrids, and a PSWF window makes
facet<->subgrid contributions compact so the full image never has to exist
in one place.

Public surface mirrors the reference package
(`/root/reference/src/ska_sdp_exec_swiftly/__init__.py`), plus the
TPU-native extras (sharded engine in :mod:`.parallel`, operator-algebra and
Pallas backends in :mod:`.ops`).
"""

__version__ = "0.1.0"

__all__ = [
    "FacetConfig",
    "SubgridConfig",
    "SwiftlyConfig",
    "SwiftlyForward",
    "SwiftlyBackward",
    "SWIFT_CONFIGS",
    "check_facet",
    "check_subgrid",
    "make_subgrid",
    "make_facet",
    "make_full_facet_cover",
    "make_full_subgrid_cover",
    "make_facet_from_sources",
    "make_subgrid_from_sources",
    "SwiftlyCore",
    "SwiftlyCoreFunc",
    "TaskQueue",
    "LRUCache",
]

from .api import (
    FacetConfig,
    LRUCache,
    SubgridConfig,
    SwiftlyBackward,
    SwiftlyConfig,
    SwiftlyForward,
    TaskQueue,
    make_full_facet_cover,
    make_full_subgrid_cover,
)
from .api_helper import check_facet, check_subgrid, make_facet, make_subgrid
from .models import make_facet_from_sources, make_subgrid_from_sources
from .ops import SwiftlyCore, SwiftlyCoreFunc
from .swift_configs import SWIFT_CONFIGS
