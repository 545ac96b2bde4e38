"""Device mesh + sharding rules.

The reference has no working distributed execution (SURVEY.md §2.10 — its
DataParallel/NCCL remnants are vestigial). Here parallelism is first-class and
TPU-native: a 1-D `data` mesh over all chips; video frames (or PatchFusion
tiles / Marigold ensemble members) are sharded along the batch axis, model
params are replicated, and the per-batch min/max stats come back via the same
jitted computation (XLA inserts the all-gathers over ICI).

Multi-host runs extend the same mesh over DCN via jax.distributed — no NCCL,
no process-per-band.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data mesh over the first n (default: all) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (frame/tile/member) axis across the mesh."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree onto every device of the mesh."""
    sharding = replicate(mesh)
    return jax.device_put(params, sharding)


def shard_batch(batch, mesh: Mesh):
    """Place a [B, ...] host array with B sharded over the data axis."""
    return jax.device_put(batch, batch_sharding(mesh))
