"""Device mesh + sharding helpers.

The reference scales with DDP/NCCL only (SURVEY.md §2#43: no TP/PP/SP — the
models are <100M params and sequences are bounded). The TPU-native equivalent
is SPMD data parallelism over a 1-D `Mesh(('data',))`: batches are sharded on
the leading axis, parameters/optimizer state are replicated, and XLA emits the
gradient psum over ICI (multi-slice DCN handled transparently by the runtime).

A second, optional 'model' axis is plumbed through for tensor-parallel
experiments on the wide LYNXNet channels; with mesh shape (-1, 1) it is inert.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices: Optional[Sequence] = None, *, data: int = -1, model: int = 1) -> Mesh:
    """A (data, model) mesh; data=-1 consumes all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch with the batch axis sharded over 'data'.

    Single-host fast path; multi-host callers use :func:`make_global_batch`.
    """
    sharding = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, replicated_sharding(mesh))

    return jax.tree.map(put, batch)


def make_global_batch(mesh: Mesh, local_batch):
    """Assemble per-process local batches into globally-sharded arrays.

    The TPU-native equivalent of the reference's manual rank-strided batch
    assignment (utils/training_utils.py:150-183): each host loads only its
    own shard of the global batch, and
    ``jax.make_array_from_process_local_data`` stitches the shards into one
    global array laid out per the 'data'-axis sharding. Every process must
    call this with the same global structure and per-key shapes (the
    DsBatchSampler's deterministic (seed, epoch) batch forming plus the
    collater pad targets guarantee that).

    On a single-process runtime this degrades to a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, local_batch)
    sharding = batch_sharding(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.make_array_from_process_local_data(replicated_sharding(mesh), x)

    return jax.tree.map(put, local_batch)
