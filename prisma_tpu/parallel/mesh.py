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


def data_mesh_or_none() -> Mesh | None:
    """The data mesh when more than one device is visible, else None."""
    return get_mesh() if len(jax.devices()) > 1 else None


def pad_to_mesh(batch, mesh: Mesh):
    """Pad the leading axis up to a multiple of the mesh size by repeating the
    last element, so ragged tile/ensemble batches (49 tiles, 10 members) can
    shard evenly; the caller drops the padded tail of the outputs."""
    import jax.numpy as jnp
    n = mesh.devices.size
    pad = (-batch.shape[0]) % n
    if pad:
        batch = jnp.concatenate(
            [batch, jnp.broadcast_to(batch[-1:], (pad,) + batch.shape[1:])],
            axis=0)
    return batch


def shard_batch_padded(batch, mesh: Mesh):
    """Edge-pad the leading axis to the mesh size and shard it over `data`.

    Returns (sharded_array, original_length) — results beyond original_length
    are duplicates of the last element and must be discarded.
    """
    import jax.numpy as jnp
    orig = batch.shape[0]
    batch = pad_to_mesh(jnp.asarray(batch), mesh)
    return jax.device_put(batch, batch_sharding(mesh)), orig
