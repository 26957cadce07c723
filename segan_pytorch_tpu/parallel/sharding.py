"""Sharding helpers: batch on the 'data' axis, params replicated.

Multi-process (multi-host) support: when jax.process_count() > 1, host arrays
are assembled into global arrays with jax.make_array_from_process_local_data —
each process contributes its LOCAL portion (its data loader's shard for the
batch; the full value for replicated params, identical across processes since
all hosts seed identically)."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicate a pytree of arrays across the mesh."""
    s = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(s, np.asarray(x)),
            tree)
    return jax.device_put(tree, s)


def _tp_spec(path_str: str, shape) -> P:
    """PartitionSpec for one state leaf under D-head tensor parallelism.

    Megatron-style split of the reference's FC head (ref discriminator.py:
    110-117): fc_0 (pool_slen*fmaps -> 256) column-parallel, its bias and the
    fc_1 PReLU slope sharded alike, fc_2 (256 -> 128) row-parallel — XLA's
    SPMD partitioner inserts the psum over 'model' after fc_2 automatically.
    fc_3/fc_4 are tiny and stay replicated. Applies uniformly to params AND
    their optimizer moments (optax state mirrors the param tree, so the same
    path/shape match places both)."""
    ndim = len(shape)
    if "'fc_0'" in path_str:
        if ndim == 2:
            return P(None, "model")
        if ndim == 1:
            return P("model")
    elif "'fc_1'" in path_str and ndim == 1:
        return P("model")
    elif "'fc_2'" in path_str and ndim == 2:
        return P("model", None)
    return P()


def shard_params(state_tree, mesh: Mesh):
    """Place a state pytree on the mesh: replicated everywhere except the
    D-head FC leaves, which tensor-shard over the 'model' axis when present.

    Uses make_array_from_callback so each process materializes only its
    addressable shards — correct under both single-controller and multi-host.
    """
    if "model" not in mesh.axis_names or mesh.shape["model"] <= 1:
        return replicate(state_tree, mesh)
    mp = mesh.shape["model"]

    def place(path, x):
        x = np.asarray(x)
        spec = _tp_spec(jax.tree_util.keystr(path), x.shape)
        for dim, axis in enumerate(spec):
            if axis == "model" and x.shape[dim] % mp != 0:
                raise ValueError(
                    f"D-head dim {x.shape[dim]} at {jax.tree_util.keystr(path)} "
                    f"not divisible by mp={mp}")
        s = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map_with_path(place, state_tree)


def shard_batch(batch_tree, mesh: Mesh):
    """Shard leading (batch) axis of every array leaf across the 'data' axis.

    Single-process: leaves are the full (global) batch.  Multi-process: each
    process passes its LOCAL batch shard and the global array is assembled
    across hosts (global batch = local batch x process_count)."""
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        def to_global(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return x  # already a global array (device_prefetch assembled it)
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.tree.map(to_global, batch_tree)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch_tree)


def local_host_rows(x, n: int | None = None) -> np.ndarray:
    """Host numpy view of the process-ADDRESSABLE leading rows of `x`.

    np.asarray on a cross-host global array raises ('spans non-addressable
    devices'); sample dumps and histogram logging only need a representative
    slab, so each process reads its own shards (row-sorted). Fully-addressable
    arrays (single-host) pass straight through."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards,
                        key=lambda s: (s.index[0].start or 0))
        arr = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    else:
        arr = np.asarray(x)
    return arr if n is None else arr[:n]
