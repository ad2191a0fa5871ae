"""AOT serving export: StableHLO round-trip equality with the live program.

The exported artifact must (1) reproduce the jitted computation exactly,
(2) be reloadable without touching the model-building code path, and
(3) carry its parameters in the artifact directory.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vqgan_tpu.serving import (
    export_cfg_sampler,
    export_program,
    load_cfg_sampler,
    load_program,
)


def test_export_program_roundtrip(tmp_path):
    def fn(x, y):
        return jnp.tanh(x @ y) + 1.0

    x = jnp.arange(12.0).reshape(3, 4)
    y = jnp.ones((4, 2))
    path = tmp_path / "prog.bin"
    export_program(fn, (x, y), path, platforms=["cpu"])

    run = load_program(path)
    np.testing.assert_allclose(np.asarray(run(x, y)),
                               np.asarray(fn(x, y)), rtol=1e-6)


def test_export_cfg_sampler_full_diffusion(tmp_path):
    """Export the real CFG sampling pipeline (tiny flagship config) and
    check the artifact reproduces diffusion.sample bit-for-bit."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent))
    from __graft_entry__ import _build_flagship

    model, diffusion = _build_flagship(
        dim=16, image_size=8, channels=4, num_classes=5, timesteps=20,
        sampling_timesteps=4)
    b = 2
    classes = jnp.array([0, 1])
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((b, 8, 8, 4)), jnp.zeros((b,), jnp.int32), classes,
        cond_drop_mask=jnp.zeros((b,), bool))

    def fn(p, key, classes):
        return diffusion.sample(p, key, classes=classes, cond_scale=2.0)

    key = jax.random.PRNGKey(1)
    want = fn(params, key, classes)

    outdir = tmp_path / "artifact"
    export_cfg_sampler(fn, params, (key, classes), outdir,
                       platforms=["cpu"], config={"cond_scale": 2.0})
    assert (outdir / "program.bin").exists()
    assert (outdir / "params.npz").exists()
    assert (outdir / "meta.json").exists()

    sampler = load_cfg_sampler(outdir)
    got = sampler(key, classes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_serve_generate_cli(tmp_path):
    """cli/serve_generate.py writes the generate.py output contract
    (ID_X/generated_###.jpg) from an artifact directory alone."""
    import os
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parent.parent

    # a tiny image-producing program: [B] classes -> [B,8,8,3] in [0,1]
    w = jnp.linspace(0.0, 1.0, 8 * 8 * 3).reshape(8, 8, 3)

    def fn(p, key, classes):
        shade = (classes.astype(jnp.float32) / 4.0)[:, None, None, None]
        return jnp.clip(p["w"][None] * 0.5 + shade * 0.5
                        + 0.01 * jax.random.uniform(key, (1, 8, 8, 3)), 0, 1)

    key = jax.random.PRNGKey(0)
    classes = jnp.zeros((2,), jnp.int32)
    outdir = tmp_path / "artifact"
    export_cfg_sampler(fn, {"w": w}, (key, classes), outdir,
                       platforms=["cpu"],
                       config={"batch_size": 2, "num_users": 3})

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(repo)
    gen = tmp_path / "generated"
    r = subprocess.run(
        [sys.executable, str(repo / "cli" / "serve_generate.py"),
         "--artifact", str(outdir), "--output_dir", str(gen),
         "--num_images", "3", "--all_users"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(repo / "cli"))
    assert r.returncode == 0, r.stderr
    for user in (1, 2, 3):
        files = sorted((gen / f"ID_{user}").glob("generated_*.jpg"))
        assert [f.name for f in files] == [
            "generated_000.jpg", "generated_001.jpg", "generated_002.jpg"]


def test_serve_http_daemon(tmp_path):
    """cli/serve_http.py serves /healthz and /generate (base64 JPEGs) from
    an artifact directory alone, on an ephemeral port."""
    import base64
    import io
    import json as _json
    import os
    import re
    import subprocess
    import sys
    import time
    import urllib.request
    from pathlib import Path

    from PIL import Image

    repo = Path(__file__).parent.parent

    w = jnp.linspace(0.0, 1.0, 8 * 8 * 3).reshape(8, 8, 3)

    def fn(p, key, classes):
        shade = (classes.astype(jnp.float32) / 4.0)[:, None, None, None]
        return jnp.clip(p["w"][None] * 0.5 + shade * 0.5
                        + 0.01 * jax.random.uniform(key, (1, 8, 8, 3)), 0, 1)

    outdir = tmp_path / "artifact"
    export_cfg_sampler(fn, {"w": w},
                       (jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32)),
                       outdir, platforms=["cpu"],
                       config={"batch_size": 2, "num_users": 3})

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(repo)
    proc = subprocess.Popen(
        [sys.executable, "-u", str(repo / "cli" / "serve_http.py"),
         "--artifact", str(outdir), "--port", "0"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=str(repo / "cli"))
    try:
        port, deadline = None, time.time() + 300
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line and proc.poll() is not None:
                raise AssertionError("server died before startup")
            m = re.search(r"serving on http://[\d.]+:(\d+)", line)
            if m:
                port = int(m.group(1))
                break
        assert port, "server never announced its port"

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=60) as r:
            health = _json.loads(r.read())
        assert health["status"] == "ok"
        assert health["batch_size"] == 2 and health["num_users"] == 3
        assert health["warm"] is True

        body = _json.dumps({"user_id": 2, "num_images": 3,
                            "seed": 7}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        assert len(out["images"]) == 3
        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        assert img.size == (8, 8)

        # invalid user -> 400
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=_json.dumps({"user_id": 99}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(bad, timeout=60)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_exported_artifact_independent_of_model_code(tmp_path):
    """The loader path uses only jax + numpy (no flax modules): simulate by
    exporting, then loading through load_cfg_sampler alone and running."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(3)(x)

    m = M()
    x = jnp.ones((2, 5))
    params = m.init(jax.random.PRNGKey(0), x)
    outdir = tmp_path / "m"
    export_cfg_sampler(lambda p, x: m.apply(p, x), params, (x,), outdir,
                       platforms=["cpu"])
    want = m.apply(params, x)

    call = load_cfg_sampler(outdir)
    np.testing.assert_allclose(np.asarray(call(x)), np.asarray(want),
                               rtol=1e-6)


def test_vq_codec_export_roundtrip(tmp_path):
    """The exported VQ codec (encode.bin/decode.bin over one params.npz)
    reproduces the live encode_to_indices/decode_from_indices exactly."""
    from vqgan_tpu.models import VQVAE
    from vqgan_tpu.serving import export_vq_codec, load_vq_codec

    model = VQVAE(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(4,), resolution=16, z_channels=8,
                  num_embeddings=16, embedding_dim=8)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), images)

    def encode(p, x):
        return model.apply(p, x, method=VQVAE.encode_to_indices)

    def decode(p, idx):
        return model.apply(p, idx, method=VQVAE.decode_from_indices)

    live_idx = jax.jit(encode)(params, images)
    outdir = tmp_path / "codec"
    export_vq_codec(encode, decode, params, images,
                    jnp.zeros_like(live_idx), outdir, platforms=["cpu"],
                    config={"batch_size": 2, "image_size": 16})

    enc, dec = load_vq_codec(outdir)
    idx = np.asarray(enc(images))
    np.testing.assert_array_equal(idx, np.asarray(live_idx))
    assert idx.dtype in (np.int32, np.int64)
    recon = np.asarray(dec(jnp.asarray(idx)))
    want = np.asarray(jax.jit(decode)(params, live_idx))
    np.testing.assert_allclose(recon, want, rtol=1e-5, atol=1e-6)
    assert recon.shape == (2, 16, 16, 3)
    # serving artifact is self-contained: three binaries + meta
    names = {p.name for p in outdir.iterdir()}
    assert {"encode.bin", "decode.bin", "params.npz",
            "meta.json"} <= names


def test_multi_device_serving_artifact(tmp_path):
    """An artifact exported over a 2-device mesh (params replicated, batch
    sharded) reloads onto a default mesh and reproduces the single-device
    program, executing across 2 devices."""
    from jax.sharding import Mesh, PartitionSpec as P

    assert len(jax.devices()) >= 2, "conftest forces 8 CPU devices"
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))

    w = jnp.linspace(0.0, 1.0, 8).reshape(8)

    def fn(p, key, classes):
        noise = jax.random.normal(key, (1, 8))
        return jnp.tanh(p["w"][None, :] * classes[:, None].astype(jnp.float32)
                        + p["b"] + 0.01 * noise)

    # multi-leaf params: flat shardings must be re-treeified at load (a
    # single-leaf tree hides arity bugs by matching the arg count)
    params = {"w": w, "b": jnp.float32(0.25)}
    key = jax.random.PRNGKey(3)
    classes = jnp.arange(4, dtype=jnp.int32)
    want = np.asarray(jax.jit(fn)(params, key, classes))

    outdir = tmp_path / "dp_artifact"
    export_cfg_sampler(fn, params, (key, classes), outdir,
                       platforms=["cpu"], mesh=mesh,
                       arg_specs=(P(), P("data")),
                       config={"batch_size": 4})
    import json as _json
    meta = _json.loads((outdir / "meta.json").read_text())
    assert meta["mesh"] == {"shape": [2], "axes": ["data"],
                            "nr_devices": 2}

    sample = load_cfg_sampler(outdir)  # default mesh over first 2 devices
    out = sample(key, classes)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
    assert len(out.sharding.device_set) == 2

    # explicit mesh over a DIFFERENT pair of devices also serves it
    mesh2 = Mesh(np.array(jax.devices()[2:4]), ("data",))
    sample2 = load_cfg_sampler(outdir, mesh=mesh2)
    out2 = sample2(key, classes)
    np.testing.assert_allclose(np.asarray(out2), want, rtol=1e-6)
    assert {d.id for d in out2.sharding.device_set} == {2, 3}


def test_tensor_parallel_serving_artifact(tmp_path):
    """param_specs shards MODEL WEIGHTS over the mesh (tensor-parallel
    serving): a dense layer with its kernel split over 'model' reproduces
    the replicated result across 2 devices."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("model",))

    k = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(k, (8, 16)),   # kernel: shard dim 1
              "b": jnp.zeros((16,))}

    def fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    want = np.asarray(jax.jit(fn)(params, x))

    outdir = tmp_path / "tp_artifact"
    export_cfg_sampler(
        fn, params, (x,), outdir, platforms=["cpu"], mesh=mesh,
        arg_specs=(P(),),                       # input replicated
        param_specs={"w": P(None, "model"),     # kernel column-sharded
                     "b": P("model")})
    sample = load_cfg_sampler(outdir)
    out = sample(x)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6)
    assert len(out.sharding.device_set) == 2


def test_bf16_params_artifact_roundtrip(tmp_path):
    """bfloat16 param leaves survive the npz round-trip (numpy stores them
    as raw void bytes; meta.json dtype tags restore them) and the loaded
    artifact reproduces the live bf16 program exactly at half the size."""
    w = jnp.linspace(-1.0, 1.0, 64).reshape(8, 8)

    def fn(p, x):
        return jnp.tanh(x @ p["w"].astype(jnp.float32) + p["n"])

    x = jnp.ones((2, 8))
    p32 = {"w": w, "n": jnp.int32(0)}
    p16 = {"w": w.astype(jnp.bfloat16), "n": jnp.int32(0)}
    want = np.asarray(jax.jit(fn)(p16, x))

    out32, out16 = tmp_path / "fp32", tmp_path / "bf16"
    export_cfg_sampler(fn, p32, (x,), out32, platforms=["cpu"])
    export_cfg_sampler(fn, p16, (x,), out16, platforms=["cpu"])

    got = np.asarray(load_cfg_sampler(out16)(x))
    np.testing.assert_array_equal(got, want)

    import json as _json
    meta = _json.loads((out16 / "meta.json").read_text())
    assert "bfloat16" in meta["param_dtypes"]
    assert (out16 / "params.npz").stat().st_size < \
        (out32 / "params.npz").stat().st_size
