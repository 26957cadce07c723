"""Sharding helpers: batch on the 'data' axis, params replicated."""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicate a pytree of arrays across the mesh."""
    s = replicated_sharding(mesh)
    return jax.device_put(tree, s)


def shard_batch(batch_tree, mesh: Mesh):
    """Shard leading (batch) axis of every array leaf across the 'data' axis."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch_tree)
