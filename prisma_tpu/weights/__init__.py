"""Checkpoint converters: torch/HF state_dicts -> prisma_tpu param pytrees."""
