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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_warn_stuck_timeout_seconds" not in flags:
    # quiet the 20 s "may be stuck" rendezvous warning — on a 1-core host
    # the 8 virtual devices run nearly serially, so late arrival at the
    # first all-reduce is expected, not a hang
    flags = (flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600")
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU's in-process collectives abort the whole process when a
    # rendezvous takes >40 s; on a 1-core CI host the 8 virtual devices
    # execute nearly serially, so a shard_map step with a slow per-device
    # prologue (e.g. device-resident augmentation) can legitimately take
    # longer than that to get all 8 participants to the first all-reduce.
    flags = (flags
             + " --xla_cpu_collective_call_terminate_timeout_seconds=900"
             + " --xla_cpu_collective_timeout_seconds=900").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


def pytest_configure(config):
    assert jax.device_count() == 8, (
        f"tests require 8 virtual CPU devices, got {jax.device_count()} "
        f"on {jax.default_backend()}")
