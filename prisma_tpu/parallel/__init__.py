"""Sharding: device meshes and named sharding rules for batched inference."""

from prisma_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, get_mesh, replicate, shard_params)
