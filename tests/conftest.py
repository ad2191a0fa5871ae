"""Test configuration: force an 8-virtual-device CPU platform so sharding /
pjit tests run without TPU hardware, and keep compilation deterministic.

This environment's sitecustomize pre-imports jax and registers the axon TPU
plugin before pytest starts, so setting JAX_PLATFORMS in os.environ is too
late — jax.config captured the value at import. We update the live config
and clear any already-initialized backends instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge  # noqa: E402

xla_bridge._clear_backends()
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

jax.config.update("jax_threefry_partitionable", True)
# This environment's default matmul precision is bf16-grade even for fp32
# inputs; parity tests need true fp32 matmuls.
jax.config.update("jax_default_matmul_precision", "highest")
