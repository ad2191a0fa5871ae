"""Smoke tests of the CLI surfaces via subprocess (CPU backend).

Drives the argparse entry points the way a user would; heavier training CLIs
are covered by the in-process trainer integration tests.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
CLI = REPO / "cli"


def _run(args, timeout=600):
    """Run a CLI on the CPU backend (strip the TPU plugin env)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    return subprocess.run(
        [sys.executable, *args], capture_output=True, text=True,
        timeout=timeout, env=env, cwd=str(CLI))


@pytest.fixture(scope="module")
def fake_data(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("cli_gait")
    rng = np.random.default_rng(0)
    for u in range(1, 3):
        d = root / f"ID_{u}"
        d.mkdir()
        for i in range(8):
            arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"f{i}.jpg")
    return root


def test_create_data_split_cli(fake_data, tmp_path):
    split = tmp_path / "split.json"
    r = _run([CLI / "create_data_split.py", "--data_path", str(fake_data),
              "--num_users", "2", "--images_per_user_train", "5",
              "--output", str(split)])
    assert r.returncode == 0, r.stderr
    assert split.exists()
    data = json.loads(split.read_text())
    assert len(data["users"]) == 2

    # --verify path
    r2 = _run([CLI / "create_data_split.py", "--data_path", str(fake_data),
               "--output", str(split), "--verify"])
    assert r2.returncode == 0, r2.stderr
    assert "split OK" in r2.stdout


def test_load_dataset_cli(fake_data, tmp_path):
    split = tmp_path / "split.json"
    _run([CLI / "create_data_split.py", "--data_path", str(fake_data),
          "--num_users", "2", "--images_per_user_train", "5",
          "--output", str(split)])
    r = _run([CLI / "load_dataset.py", "--data_root", str(fake_data),
              "--split", str(split), "--image_size", "16", "--test_load"])
    assert r.returncode == 0, r.stderr
    assert "smoke load OK" in r.stdout
    assert "total: 10 train / 6 test" in r.stdout


def test_cli_error_paths(tmp_path):
    # verify on a corrupted split reports problems and exits nonzero
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({
        "metadata": {},
        "users": {"ID_1": {
            "total_images": 2,
            "train_images": ["a.jpg"], "train_indices": [0],
            "test_images": ["a.jpg"], "test_indices": [1],
        }},
    }))
    r = _run([CLI / "create_data_split.py", "--data_path", str(tmp_path),
              "--output", str(bad), "--verify"])
    assert r.returncode == 1
    assert "overlap" in r.stdout


def test_diffusers_cli_validates_head_dim_like_reference():
    """The adapter enforces the reference's parse_args rules
    (train_stage1_diffusers.py:380-396): csv parsing, per-level
    divisibility, and the multiple-of-8 head-dim rule."""
    script = str(CLI / "train_stage1_diffusers.py")

    # channels (model_dim*mult) not divisible by head_dim
    r = _run([script, "--model_dim", "96", "--dim_mults", "1,2,4,4",
              "--attention_head_dim", "80"])
    assert r.returncode != 0
    assert "not divisible" in r.stderr

    # head_dim not a multiple of 8
    r = _run([script, "--model_dim", "96", "--attention_head_dim", "12"])
    assert r.returncode != 0
    assert "multiple of 8" in r.stderr

    # csv head dims: length mismatch with dim_mults
    r = _run([script, "--dim_mults", "1,2,4,4",
              "--attention_head_dim", "64,64"])
    assert r.returncode != 0
    assert "length" in r.stderr

    # non-integer csv
    r = _run([script, "--dim_mults", "1,2,x"])
    assert r.returncode != 0
    assert "csv integers" in r.stderr


def test_serving_clis_arg_validation():
    """The serving CLIs reject incomplete/invalid invocations cleanly."""
    # cfg_sampler mode demands --checkpoint and --vae_path
    r = _run([CLI / "export_serving.py", "--out", "/tmp/x"])
    assert r.returncode == 2
    assert "requires --checkpoint" in r.stderr
    # vq_codec mode demands --vqgan_path
    r = _run([CLI / "export_serving.py", "--mode", "vq_codec"])
    assert r.returncode == 2
    assert "requires --vqgan_path" in r.stderr
    # serving hosts demand --artifact
    for script in ("serve_generate.py", "serve_http.py"):
        r = _run([CLI / script])
        assert r.returncode == 2, script
        assert "--artifact" in r.stderr


def test_train_vqgan_step_mode_auto_policy():
    """'auto' routes reference-scale runs to the block-dispatched scan loop
    and short/debug runs to the per-step split programs; explicit modes pass
    through untouched (no subprocess: pure policy function)."""
    sys.path.insert(0, str(CLI))
    try:
        from train_vqgan import resolve_step_mode
    finally:
        sys.path.pop(0)
    assert resolve_step_mode("auto", 30000) == "scan"
    assert resolve_step_mode("auto", 1000) == "scan"
    assert resolve_step_mode("auto", 999) == "split"
    assert resolve_step_mode("auto", 250) == "split"
    for mode in ("split", "fused", "scan"):
        assert resolve_step_mode(mode, 10) == mode
        assert resolve_step_mode(mode, 100000) == mode
