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
