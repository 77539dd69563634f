"""Test config: run everything on a virtual 8-device CPU mesh.

Tests never need real TPU hardware; the DP/sharding tests exercise the
multi-chip path via 8 virtual CPU devices (SURVEY.md §4).

Env vars alone are not enough: pytest plugins (e.g. chex/flax) may import
jax before this conftest executes, so we also go through jax.config, which
takes effect any time before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_configure(config):
    assert jax.device_count() == 8, (
        f"tests require 8 virtual CPU devices, got {jax.device_count()} "
        f"on {jax.default_backend()}")
