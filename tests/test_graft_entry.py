"""Driver-contract tests for __graft_entry__.py.

The round-1 driver capture failed because dryrun_multichip could not
re-platform after the caller had already initialized a 1-device backend
(MULTICHIP_r01.json: rc=1). These tests pin the self-heal behavior:
- _ensure_devices must provision >= n devices even when a too-small
  backend is already live (the exact driver scenario), and
- the full dryrun must pass end-to-end in that state.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_ensure_devices_heals_initialized_backend():
    """Simulate the driver: a 1-device backend is fully initialized before
    dryrun_multichip is called. Run in a subprocess so we don't disturb the
    test session's own 8-device CPU backend."""
    code = f"""
import jax
# pin a deliberately-too-small backend and initialize it (driver scenario)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
assert len(jax.devices()) == 1
import sys; sys.path.insert(0, {str(REPO)!r})
from __graft_entry__ import _ensure_devices
_ensure_devices(8)
assert len(jax.devices()) >= 8, jax.devices()
assert jax.default_backend() == "cpu"
import jax.numpy as jnp
assert float(jax.jit(lambda x: x.sum())(jnp.ones(8))) == 8.0
print("HEAL_OK", len(jax.devices()))
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "HEAL_OK 8" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    """Full dryrun_multichip(8) with a pre-initialized 1-device backend —
    the end-to-end driver contract."""
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
assert len(jax.devices()) == 1
import sys; sys.path.insert(0, {str(REPO)!r})
from __graft_entry__ import dryrun_multichip
dryrun_multichip(8)
"""
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): OK" in proc.stdout
