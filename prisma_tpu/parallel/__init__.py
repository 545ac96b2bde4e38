"""Sharding: device meshes and named sharding rules for batched inference."""

from prisma_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, data_mesh_or_none, get_mesh, pad_to_mesh, replicate,
    shard_batch, shard_batch_padded, shard_params)
