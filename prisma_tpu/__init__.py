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

# Persistent XLA compilation cache: this environment compiles TPU executables
# locally (AOT libtpu) on a single CPU core — large programs take tens of
# minutes — so caching compiled binaries across processes is essential.
# Opt out with PRISMA_TPU_NO_COMPILE_CACHE=1.
import os as _os

if _os.environ.get("PRISMA_TPU_NO_COMPILE_CACHE", "0") != "1":
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/prisma_tpu_xla"))
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is best-effort; never block imports
        pass
