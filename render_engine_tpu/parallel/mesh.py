"""Mesh construction and sharding specs for the world pytree and frames.

Design (scaling-book recipe): pick a mesh, annotate leaf shardings, let XLA
insert collectives, profile, iterate. The engine's two shardable axes:

  * ``world`` mesh axis: entity arrays shard on dim 0 (capacity), the
    rendered image shards on dim 0 (rows). The logic tick is almost fully
    element-parallel over entities (one all-gather for the grid sort +
    neighbor windows); the render pass all-gathers the (budgeted) triangle
    batch, then tiles shade row-locally.

Entity capacity and image height must be divisible by the axis size (pad
capacity up — it is a budget anyway).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "world") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(f"need {n} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n]), (axis_name,))


def world_sharding(world, mesh: Mesh, axis_name: str = "world"):
    """A pytree of NamedShardings matching ``world``: every per-entity array
    shards on dim 0; anything else is replicated."""
    cap = world.capacity
    n = mesh.shape[axis_name]

    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == cap \
                and cap % n == 0:
            return NamedSharding(mesh, P(axis_name))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, world)


def shard_world(world, mesh: Mesh, axis_name: str = "world"):
    """device_put the world with entity-axis sharding."""
    sh = world_sharding(world, mesh, axis_name)
    return jax.device_put(world, sh)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def image_sharding(mesh: Mesh, axis_name: str = "world"):
    """Rendered frames shard across rows."""
    return NamedSharding(mesh, P(axis_name))
