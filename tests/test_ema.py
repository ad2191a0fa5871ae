"""EMA decay-ramp parity vs ema_pytorch's update algorithm.

The reference wraps its diffusion model in ema_pytorch.EMA
(/root/reference/train_latent_cfg.py:487-495) and calls ``ema.update()``
once per train step. ema_pytorch's semantics (its defaults, all versions):

    step s (0-based, incremented per update() call):
      s % update_every != 0  -> no-op
      s <= update_after_step -> copy online params into EMA
      else: ema.lerp_(online, 1 - d) with
            epoch = max(s - update_after_step - 1, 0)
            d = 0 if epoch <= 0 else
                clip(1 - (1 + epoch/inv_gamma)**(-power), min_value, beta)
      (defaults inv_gamma=1.0, power=2/3, min_value=0.0)

ema_pytorch isn't installed here, so the oracle below is a literal numpy
transcription of that algorithm; vqgan_tpu.training.ema must reproduce its
trajectory exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vqgan_tpu.training.ema import ema_decay_at_step, ema_update


def ema_pytorch_oracle(online_seq, *, beta, update_every, update_after_step,
                       inv_gamma=1.0, power=2.0 / 3.0, min_value=0.0):
    """Numpy transcription of ema_pytorch.EMA.update() over a param
    trajectory; returns the EMA value after each step."""
    ema = None
    out = []
    for s, p in enumerate(online_seq):
        if ema is None:
            ema = p  # copy_params_from_model_to_ema at construction
        if s % update_every == 0:
            if s <= update_after_step:
                ema = p
            else:
                epoch = max(s - update_after_step - 1, 0.0)
                if epoch <= 0:
                    d = 0.0
                else:
                    d = min(max(1.0 - (1.0 + epoch / inv_gamma) ** (-power),
                                min_value), beta)
                ema = np.float32(ema * d + p * (1.0 - d))
        out.append(ema)
    return np.asarray(out)


@pytest.mark.parametrize("update_every,update_after_step", [(1, 0), (10, 100),
                                                            (3, 7)])
def test_ema_ramp_trajectory_matches_torch_formula(update_every,
                                                   update_after_step):
    beta = 0.995
    n = 400
    rng = np.random.default_rng(0)
    # fp32 trajectory: jax runs without x64 here, so the oracle and the
    # jax path must accumulate in the same precision
    online = rng.normal(size=(n,)).astype(np.float32).cumsum(
        dtype=np.float32)

    want = ema_pytorch_oracle(online, beta=beta, update_every=update_every,
                              update_after_step=update_after_step)

    ema = jnp.asarray(online[0], jnp.float32)
    got = []
    for s in range(n):
        ema = ema_update(ema, jnp.asarray(online[s], jnp.float32),
                         jnp.asarray(s),
                         decay=beta, update_every=update_every,
                         update_after_step=update_after_step)
        got.append(float(ema))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_decay_schedule_values():
    # hand-checked points of the ramp (beta=0.9999 ema_pytorch default form)
    beta, uas = 0.9999, 100
    d = lambda s: float(ema_decay_at_step(jnp.asarray(s), beta=beta,
                                          update_after_step=uas))
    assert d(100) == 0.0          # still warm
    assert d(101) == 0.0          # epoch == 0 -> hard 0
    np.testing.assert_allclose(d(102), 1.0 - 2.0 ** (-2.0 / 3.0), rtol=1e-6)
    np.testing.assert_allclose(
        d(1101), 1.0 - 1001.0 ** (-2.0 / 3.0), rtol=1e-6)
    # asymptote clamps at beta
    assert d(10**9) == pytest.approx(beta)


def test_constant_decay_opt_out():
    # use_ramp=False recovers the round-3 constant-decay behavior
    e = ema_update(jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(500),
                   decay=0.9, update_every=1, update_after_step=0,
                   use_ramp=False)
    np.testing.assert_allclose(float(e), 0.9, rtol=1e-6)


def test_ramp_inside_jit_and_pytree():
    params = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    new = jax.tree.map(lambda x: x + 1.0, params)
    f = jax.jit(lambda e, p, s: ema_update(e, p, s, decay=0.995,
                                           update_every=1,
                                           update_after_step=0))
    out = f(params, new, jnp.asarray(2))
    d = 1.0 - 2.0 ** (-2.0 / 3.0)  # epoch=1
    np.testing.assert_allclose(
        np.asarray(out["a"]), 1.0 * d + 2.0 * (1 - d), rtol=1e-6)
