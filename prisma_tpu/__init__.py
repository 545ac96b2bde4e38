"""prisma_tpu — TPU-native band-extraction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of PRISMA
(patriciogonzalezvivo/prisma): monocular depth, optical flow, instance
segmentation, and camera-pose bands derived from a single image or video,
written to the reference's folder layout and metadata.json manifest.

Layering (TPU-first, contrast with the reference's subprocess-per-band design):

  cli/        process / view / concat entry points (in-process orchestration)
  bands/      band drivers: the load_metadata -> batched infer -> mp4/csv contract
  runtime/    device mesh, frame-batch streaming engine, typed config
  models/     flax model definitions (ViT/DPT, RAFT, GMFlow, ZoeDepth, SOLOv2, ...)
  ops/        jittable pre/post ops (encoders, resize, flow utils) + pallas kernels
  parallel/   jax.sharding meshes and sharding rules (data-parallel over frames/tiles)
  weights/    torch-checkpoint -> JAX pytree converters
  io/         host-side media IO (native libav codec bindings, png, ply, flo, csv)
  utils/      metadata manifest, small helpers
"""

__version__ = "0.1.0"
