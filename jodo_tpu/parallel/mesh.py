"""Device mesh + sharding helpers (the DataParallel replacement).

The workload's parallelism is pure data parallelism (SURVEY.md section 2.2:
the reference's only multi-device path is torch.nn.DataParallel). Here:
parameters/EMA/optimizer state are replicated, the batch is sharded over a
1-D 'data' mesh, and XLA inserts the gradient psum over ICI. Mesh creation
honours `config.tpu.mesh_shape` for multi-axis layouts.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate_state", "shard_batch", "batch_sharding"]


def make_mesh(mesh_shape: str = "", devices=None) -> Optional[Mesh]:
    """'' => 1-D data mesh over all devices; 'a,b' => ('data','model')."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) <= 1:
        return None
    if mesh_shape:
        dims = tuple(int(x) for x in mesh_shape.split(","))
    else:
        dims = (len(devices),)
    axis_names = ("data", "model")[: len(dims)]
    dev_array = np.asarray(devices[: int(np.prod(dims))]).reshape(dims)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Optional[Mesh]):
    if mesh is None:
        return batch
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def shard_stacked_batch(batch, mesh: Optional[Mesh]):
    """Place a K-step stacked batch [K, B, ...] with the BATCH axis (dim 1)
    sharded over the 'data' mesh axis (multi-step dispatch; no-op without
    a mesh)."""
    if mesh is None:
        return batch
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, "data", *([None] * (np.ndim(x) - 2))))
        ),
        batch,
    )


def replicate_state(state, mesh: Optional[Mesh]):
    if mesh is None:
        return state
    repl = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, repl), state)
