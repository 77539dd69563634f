"""Test config: run everything on a virtual 8-device CPU mesh.

Tests never need real TPU hardware; the DP/sharding tests exercise the
multi-chip path via xla_force_host_platform_device_count (SURVEY.md §4).
Environment must be set before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# keep test compiles fast and deterministic
os.environ.setdefault("JAX_ENABLE_X64", "0")
