"""Device mesh construction and multi-host initialization.

The reference is strictly single-GPU ("Multi-GPU is not supported yet", ref README.md:79).
Here data parallelism is first-class: a 1-D 'data' mesh over all chips (ICI within a slice,
DCN across slices), with the batch axis sharded and parameters replicated.  XLA inserts the
gradient all-reduce (psum over 'data') automatically under jit, and BatchNorm reductions in
D become cross-replica for free (see models/modules.py:BatchNorm1d).

A 'model' axis (make_mesh(dp, mp)) tensor-shards the D head FC (16·1024→256, the one
weight big enough to matter) Megatron-style — column-parallel fc_0, row-parallel fc_2,
XLA inserting the reduce over 'model' automatically (see sharding.shard_params). At
~91M params SEGAN needs no TP for capacity (SURVEY §2.6); the axis exists for very
large global batches where the replicated head's gradient all-reduce dominates.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host bring-up via jax.distributed (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        # CPU multi-process collectives need the gloo backend (no-op for TPU,
        # where collectives ride ICI/DCN natively); enables the 2-process
        # localhost smoke in tests/test_multihost.py
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def distributed_barrier(name: str, timeout_s: float = 240.0):
    """Coordination-service barrier (no-op single-process).

    Unlike collective-based sync (psum/allgather), this rides the gRPC
    coordination service with a CONFIGURABLE timeout — use it to align
    processes BEFORE the first collective dispatch: gloo's context-creation
    key-value wait is a hard 30 s, and per-process bring-up skew (imports,
    device init, AOT compiles) can exceed it on loaded hosts, failing the
    job with "Gloo context initialization ... GetKeyValue() timed out"."""
    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist
    client = getattr(_dist.global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(name, int(timeout_s * 1000))


def shutdown_distributed():
    """Explicit synchronized jax.distributed shutdown (no-op single-process).

    Call this right after the last collective work (end of training), while
    every process is still in lockstep: the atexit shutdown barrier has a hard
    ~30 s deadline, and on loaded hosts a straggler's interpreter TEARDOWN
    (GC of device arrays, cache flush) can exceed it — killing the whole job
    with "Shutdown barrier timed out" after all real work already succeeded."""
    if jax.process_count() <= 1:
        return
    try:
        jax.distributed.shutdown()
    except Exception as e:  # already shut down / never initialized
        print(f"[multi-host] distributed shutdown: {e}")


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build the device mesh: 1-D 'data' (default), or 2-D ('data', 'model')
    when mp > 1 — dp x mp devices, the 'model' axis innermost so its
    collectives ride the fastest ICI links."""
    devices = devices if devices is not None else jax.devices()
    if not isinstance(mp, (int, np.integer, type(None))):
        raise TypeError(f"mp must be an int, got {type(mp).__name__} "
                        "(pass axis_names by keyword)")
    mp = int(mp or 1)
    if mp > 1:
        if tuple(axis_names) not in (("data",), ("data", "model")):
            raise ValueError(
                "axis_names is fixed to ('data', 'model') when mp > 1")
        if dp is None or dp <= 0:
            if len(devices) % mp != 0:
                raise ValueError(
                    f"device count {len(devices)} not divisible by mp={mp}")
            dp = len(devices) // mp
        need = dp * mp
        if need > len(devices):
            raise ValueError(f"dp*mp={need} exceeds available devices "
                             f"{len(devices)}")
        dev = np.asarray(devices[:need]).reshape((dp, mp))
        return Mesh(dev, axis_names=("data", "model"))
    if dp is None or dp <= 0:
        dp = len(devices)
    if dp > len(devices):
        raise ValueError(f"dp={dp} exceeds available devices {len(devices)}")
    dev = np.asarray(devices[:dp]).reshape((dp,))
    return Mesh(dev, axis_names=tuple(axis_names))
