"""Pallas TPU kernels for the hot ops (flash attention, fused correlation)."""
