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


# --- fast/slow tiers -------------------------------------------------------
# `pytest -m "not slow"` is the fast tier. The slow set is data-driven from
# measured durations (tests/slow_tests.txt) so nobody has to remember to
# decorate; tests may ALSO carry an explicit @pytest.mark.slow.
from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

_SLOW_FILE = Path(__file__).parent / "slow_tests.txt"
_SLOW_IDS = {
    line.strip() for line in _SLOW_FILE.read_text().splitlines()
    if line.strip() and not line.startswith("#")
} if _SLOW_FILE.exists() else set()


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        if base in _SLOW_IDS or f"tests/{base}" in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)
