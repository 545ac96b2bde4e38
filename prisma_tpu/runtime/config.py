"""Typed runtime configuration (one config tree instead of the reference's three
coexisting flag systems — SURVEY.md §5 'Config / flag system')."""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass
class RuntimeConfig:
    """Execution knobs shared by all bands."""
    batch_size: int = 8                  # frames per device step (video)
    compute_dtype: str = "bfloat16"      # matmul dtype on device
    overwrite: bool = True               # non-interactive by default (library use)
    models_dir: str = field(
        default_factory=lambda: os.environ.get("PRISMA_TPU_MODELS", "models"))
    random_weights: bool = False         # tests / smoke runs without checkpoints
    data_parallel: bool = True           # shard the frame batch over the mesh
    weight_cache: bool = True            # orbax cache of converted checkpoints
    # frame-index resume: video bands write fixed-size mp4 segments and a
    # min/max ledger; a killed run resumes at the last complete segment and
    # produces byte-identical output (0 = single-session writer, no resume)
    segment_frames: int = 64
    # x264 preset for band output mp4s. "veryfast" is the production default:
    # measured decoded-fidelity-equivalent to x264's default "medium" at
    # crf 15 on band-like content, with smaller files and ~3x encode
    # throughput (bench_all.bench_host_io). "" = x264 default (medium) — the
    # reference writer's behavior, kept for the rgba source band.
    x264_preset: str = "veryfast"
    # concurrent segment encoders per output stream (segment pool encode;
    # io/video.py SegmentedVideoWriter workers). 0 = auto from host cores.
    encode_workers: int = 0

    def resolve_dtype(self):
        import jax.numpy as jnp
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[self.compute_dtype]

    def resolve_encode_workers(self) -> int:
        if self.encode_workers > 0:
            return self.encode_workers
        return max(1, min(4, (os.cpu_count() or 1) // 2))
