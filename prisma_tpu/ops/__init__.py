"""Jittable pre/post-processing ops and Pallas kernels."""
