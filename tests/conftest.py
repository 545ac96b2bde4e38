"""Test configuration: run JAX on 8 virtual CPU devices so sharding/multi-chip
code paths are exercised without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize imports jax and registers the 'axon' TPU
plugin before any test code runs, so JAX_PLATFORMS env tweaks are too late —
jax.config.update is the reliable override (backends initialize lazily).
"""

import os
import sys

# The persistent XLA compilation cache (prisma_tpu/__init__.py) exists for the
# tens-of-minutes TPU compiles. On XLA:CPU a cached AOT executable compiled
# under different detected host features codegens differently from a fresh
# compile (~1e-3 result drift, see the cpu_aot_loader machine-feature warning),
# which breaks byte-identical golden tests — so tests always compile fresh.
os.environ["PRISMA_TPU_NO_COMPILE_CACHE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
