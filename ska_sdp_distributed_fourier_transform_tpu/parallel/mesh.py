"""Device-mesh helpers for the sharded SwiFTly engine."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

TILE_AXIS = "tile"

__all__ = ["TILE_AXIS", "make_tile_mesh", "tile_sharding",
           "replicated_sharding"]


def make_tile_mesh(n_devices=None, devices=None) -> Mesh:
    """Build the engine's 1-D mesh over ``n_devices`` (default: all).

    One mesh axis ("tile") carries both roles: facets are sharded over it
    between columns, subgrid batches are sharded over it within a column —
    the forward ``psum_scatter`` / backward ``all_to_all`` redistribution
    moves data between the two layouts over ICI.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (TILE_AXIS,))


def tile_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading axis over the tile mesh axis."""
    return NamedSharding(mesh, PartitionSpec(TILE_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding on the mesh."""
    return NamedSharding(mesh, PartitionSpec())
