"""Gaussian diffusion process (DDPM/DDIM) with optional classifier-free
guidance — the stage-2 training loss and samplers.

One implementation unifies the reference's three near-identical copies
(denoising_diffusion_pytorch/denoising_diffusion_pytorch.py:478-843,
classifier_free_guidance.py:588-919, and the vqgan_ldm_baseline duplicate —
SURVEY.md §2.2 flags the duplication).

TPU-native design:
- Sampling loops are single `lax.scan`s over precomputed (time, time_next)
  pairs — the whole sampler compiles to one XLA program; no per-step host
  round-trips (the reference runs a Python loop with tqdm).
- The CFG double forward (cond + null) is batched into one 2B-batch forward:
  one MXU-saturating call instead of two sequential ones.
- The "skip the second forward when cond_scale == 1" fast path
  (reference cfg.py:739-743) is a compile-time Python branch.
- Explicit PRNG key threading everywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diffusion_math as dm
from ..core.guidance import apply_cfg
from ..core.schedules import DiffusionSchedule, make_schedule

__all__ = ["GaussianDiffusion"]

ModelApply = Callable[..., jax.Array]


def _identity(x):
    return x


def _immiscible_assignment(x_start: jax.Array, noise: jax.Array,
                           method: str = "host") -> jax.Array:
    """Immiscible diffusion (arXiv 2406.12303): permute the noise batch so
    each sample gets its nearest noise draw. method="host" is the exact
    Hungarian assignment via pure_callback (reference ddpm.py:769-781 uses
    scipy's linear_sum_assignment); method="auction" solves the assignment
    ON DEVICE (ops/assignment.py ε-auction) — no host sync in the step."""
    b = x_start.shape[0]
    xf = x_start.reshape(b, -1).astype(jnp.float32)
    nf = noise.reshape(b, -1).astype(jnp.float32)
    # pairwise squared distances via the MXU
    dist = (
        jnp.sum(xf**2, 1, keepdims=True)
        - 2.0 * jnp.dot(xf, nf.T, preferred_element_type=jnp.float32)
        + jnp.sum(nf**2, 1)[None, :]
    )

    if method == "auction":
        from ..ops.assignment import auction_assignment

        return noise[auction_assignment(dist)]
    assert method == "host", method

    def host_assign(d):
        from scipy.optimize import linear_sum_assignment

        _, cols = linear_sum_assignment(d)
        return cols.astype(np.int32)

    align = jax.pure_callback(
        host_assign, jax.ShapeDtypeStruct((b,), jnp.int32), dist,
        vmap_method="sequential")
    return noise[align]


@dataclasses.dataclass
class GaussianDiffusion:
    """Functional diffusion wrapper around a model-apply callable.

    model_apply(params, x, t, classes, *, cond_drop_mask=None, rng=None,
                return_features=False) -> prediction  (classes may be None
    for unconditional models).

    Defaults mirror the reference LDM configuration
    (train_latent_cfg.py:437-447): T=1000, DDIM 150, pred_v, cosine betas,
    Min-SNR γ=5, auto_normalize=False for latents.
    """

    model_apply: ModelApply
    image_size: int
    channels: int = 3
    timesteps: int = 1000
    sampling_timesteps: Optional[int] = None
    objective: str = "pred_noise"
    beta_schedule: str = "cosine"
    ddim_sampling_eta: float = 1.0
    offset_noise_strength: float = 0.0
    min_snr_loss_weight: bool = False
    min_snr_gamma: float = 5.0
    use_cfg_plus_plus: bool = False
    auto_normalize: bool = True
    immiscible: bool = False
    # "host": exact scipy Hungarian via pure_callback (reference-exact,
    # but a device→host sync per step). "auction": ops/assignment.py
    # ε-auction entirely in-graph — no callback, pipelined-execution- and
    # multi-host-safe, within b·ε of optimal (immaterial for a heuristic).
    immiscible_method: str = "host"
    self_condition: bool = False  # unconditional models only (reference
    # ddpm.py: 50% coin-flip stop-gradient x0 estimate during training,
    # previous step's x0 during sampling)
    schedule: DiffusionSchedule = None

    def __post_init__(self):
        if self.objective not in ("pred_noise", "pred_x0", "pred_v"):
            raise ValueError(f"unknown objective {self.objective!r}")
        if self.schedule is None:
            self.schedule = make_schedule(
                self.beta_schedule,
                self.timesteps,
                objective=self.objective,
                min_snr_loss_weight=self.min_snr_loss_weight,
                min_snr_gamma=self.min_snr_gamma,
            )
        if self.sampling_timesteps is None:
            self.sampling_timesteps = self.timesteps
        assert self.sampling_timesteps <= self.timesteps
        self.is_ddim_sampling = self.sampling_timesteps < self.timesteps
        self.normalize = (
            dm.normalize_to_neg_one_to_one if self.auto_normalize else _identity
        )
        self.unnormalize = (
            dm.unnormalize_to_zero_to_one if self.auto_normalize else _identity
        )

    # ------------------------------------------------------------------
    # prediction
    # ------------------------------------------------------------------

    def model_predictions(
        self,
        params,
        x,
        t,
        classes=None,
        *,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
        clip_x_start: bool = False,
        x_self_cond=None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (pred_noise, pred_x_start)."""
        sched = self.schedule

        if classes is None or cond_scale == 1.0:
            # compile-time fast path: single conditional forward
            if classes is None:
                if self.self_condition:
                    if x_self_cond is None:
                        x_self_cond = jnp.zeros_like(x)
                    model_output = self.model_apply(params, x, t, x_self_cond)
                else:
                    model_output = self.model_apply(params, x, t)
            else:
                b = x.shape[0]
                model_output = self.model_apply(
                    params, x, t, classes,
                    cond_drop_mask=jnp.zeros((b,), bool),
                )
            model_output_null = None
        else:
            # batched CFG: [cond; null] in one forward
            b = x.shape[0]
            xx = jnp.concatenate([x, x], axis=0)
            tt = jnp.concatenate([t, t], axis=0)
            cc = jnp.concatenate([classes, classes], axis=0)
            mask = jnp.concatenate(
                [jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0
            )
            both = self.model_apply(params, xx, tt, cc, cond_drop_mask=mask)
            logits, null_logits = both[:b], both[b:]
            model_output = apply_cfg(
                logits, null_logits, cond_scale, rescaled_phi
            )
            model_output_null = null_logits

        maybe_clip = (
            (lambda z: jnp.clip(z, -1.0, 1.0)) if clip_x_start else _identity
        )

        if self.objective == "pred_noise":
            pred_noise = (
                model_output
                if (not self.use_cfg_plus_plus or model_output_null is None)
                else model_output_null
            )
            x_start = dm.predict_start_from_noise(sched, x, t, model_output)
            x_start = maybe_clip(x_start)
        elif self.objective == "pred_x0":
            x_start = maybe_clip(model_output)
            x_for_noise = (
                x_start
                if (not self.use_cfg_plus_plus or model_output_null is None)
                else maybe_clip(model_output_null)
            )
            pred_noise = dm.predict_noise_from_start(sched, x, t, x_for_noise)
        else:  # pred_v
            x_start = maybe_clip(dm.predict_start_from_v(sched, x, t, model_output))
            x_for_noise = x_start
            if self.use_cfg_plus_plus and model_output_null is not None:
                x_for_noise = maybe_clip(
                    dm.predict_start_from_v(sched, x, t, model_output_null)
                )
            pred_noise = dm.predict_noise_from_start(sched, x, t, x_for_noise)

        return pred_noise, x_start

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def p_losses(
        self,
        params,
        key,
        x_start,
        t,
        classes=None,
        *,
        noise=None,
        cond_drop_prob: Optional[float] = None,
        return_features: bool = False,
    ):
        k_noise, k_offset, k_drop = jax.random.split(key, 3)
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, jnp.float32)
        if self.immiscible:
            noise = _immiscible_assignment(
                x_start, noise, method=self.immiscible_method)
        if self.offset_noise_strength > 0.0:
            # per-(sample, channel) constant offset (reference ddpm.py:793-799)
            offset = jax.random.normal(
                k_offset, (x_start.shape[0], x_start.shape[-1]), jnp.float32
            )
            offset = offset.reshape(
                offset.shape[0], *((1,) * (x_start.ndim - 2)), -1)
            noise = noise + self.offset_noise_strength * offset

        x = dm.q_sample(self.schedule, x_start, t, noise)

        kwargs = {}
        if classes is not None:
            kwargs = dict(cond_drop_prob=cond_drop_prob, rng=k_drop)
            model_out = self.model_apply(
                params, x, t, classes, return_features=return_features, **kwargs
            )
        elif self.self_condition:
            # 50% of steps feed a stop-gradient x0 estimate from a first
            # no-self-cond forward (reference ddpm.py p_losses)
            pred0 = self.model_apply(params, x, t, jnp.zeros_like(x))
            if self.objective == "pred_noise":
                x0_est = dm.predict_start_from_noise(self.schedule, x, t, pred0)
            elif self.objective == "pred_x0":
                x0_est = pred0
            else:
                x0_est = dm.predict_start_from_v(self.schedule, x, t, pred0)
            x0_est = jax.lax.stop_gradient(x0_est)
            coin = jax.random.uniform(k_drop, ()) < 0.5
            x_self_cond = jnp.where(coin, x0_est, 0.0)
            model_out = self.model_apply(
                params, x, t, x_self_cond, return_features=return_features
            )
        else:
            model_out = self.model_apply(
                params, x, t, return_features=return_features
            )
        features = None
        if return_features:
            model_out, features = model_out

        if self.objective == "pred_noise":
            target = noise
        elif self.objective == "pred_x0":
            target = x_start
        else:
            target = dm.predict_v(self.schedule, x_start, t, noise)

        loss = jnp.mean(
            (model_out.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
            axis=tuple(range(1, model_out.ndim)),
        )
        loss = loss * self.schedule.loss_weight[t]
        loss = jnp.mean(loss)
        if return_features:
            return loss, features
        return loss

    def loss(self, params, key, img, classes=None, **kwargs):
        """Full training objective: sample t, normalize, p_losses
        (reference cfg.py:913-919)."""
        b = img.shape[0]
        k_t, k_p = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, self.timesteps)
        img = self.normalize(img)
        return self.p_losses(params, k_p, img, t, classes, **kwargs)

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------

    def _ddim_time_pairs(self) -> jax.Array:
        times = np.linspace(
            -1, self.timesteps - 1, num=self.sampling_timesteps + 1
        ).astype(int)[::-1]
        return jnp.asarray(
            list(zip(times[:-1], times[1:])), dtype=jnp.int32
        )  # [(T-1, ...), ..., (0, -1)]

    def ddim_sample(
        self,
        params,
        key,
        shape,
        classes=None,
        *,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
        clip_denoised: bool = True,
        return_all_timesteps: bool = False,
        init_noise=None,
        step_noise=None,
    ):
        """DDIM sampler as one lax.scan (reference cfg.py:807-840).
        return_all_timesteps stacks every intermediate along axis 1
        (reference ddpm.py return_all_timesteps).

        init_noise / step_noise override the drawn randomness (init_noise:
        `shape`; step_noise: `(sampling_timesteps, *shape)`) — used by the
        torch full-chain parity tests to drive both samplers with identical
        noise."""
        pairs = self._ddim_time_pairs()
        k_init, k_loop = jax.random.split(key)
        img0 = (jnp.asarray(init_noise, jnp.float32) if init_noise is not None
                else jax.random.normal(k_init, shape, jnp.float32))
        xs0 = jnp.zeros(shape, jnp.float32)
        inject = step_noise is not None
        xs = (pairs, jnp.asarray(step_noise, jnp.float32)) if inject else pairs

        def body(carry, x):
            pair, given_noise = x if inject else (x, None)
            img, prev_x_start, k = carry
            time, time_next = pair[0], pair[1]
            tb = jnp.full((shape[0],), time, jnp.int32)
            pred_noise, x_start = self.model_predictions(
                params, img, tb, classes,
                cond_scale=cond_scale, rescaled_phi=rescaled_phi,
                clip_x_start=clip_denoised,
                x_self_cond=prev_x_start if self.self_condition else None,
            )
            k, kn = jax.random.split(k)
            noise = (given_noise if inject
                     else jax.random.normal(kn, shape, jnp.float32))
            img = dm.ddim_step(
                self.schedule, img, x_start, pred_noise, time, time_next,
                noise, self.ddim_sampling_eta,
            )
            return (img, x_start, k), (img if return_all_timesteps else None)

        (img, _, _), steps = jax.lax.scan(body, (img0, xs0, k_loop), xs)
        if return_all_timesteps:
            all_imgs = jnp.concatenate(
                [img0[:, None], jnp.swapaxes(steps, 0, 1)], axis=1)
            return self.unnormalize(all_imgs)
        return self.unnormalize(img)

    def p_sample_loop(
        self,
        params,
        key,
        shape,
        classes=None,
        *,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
        clip_denoised: bool = True,
        return_all_timesteps: bool = False,
    ):
        """Ancestral DDPM sampler as one lax.scan (reference cfg.py:784-805)."""
        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)
        xs0 = jnp.zeros(shape, jnp.float32)
        ts = jnp.arange(self.timesteps - 1, -1, -1, dtype=jnp.int32)

        def body(carry, t):
            img, prev_x_start, k = carry
            tb = jnp.full((shape[0],), t, jnp.int32)
            _, x_start = self.model_predictions(
                params, img, tb, classes,
                cond_scale=cond_scale, rescaled_phi=rescaled_phi,
                x_self_cond=prev_x_start if self.self_condition else None,
            )
            if clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = dm.q_posterior(self.schedule, x_start, img, tb)
            k, kn = jax.random.split(k)
            noise = jax.random.normal(kn, shape, jnp.float32)
            noise = jnp.where(t > 0, noise, 0.0)  # no noise at t == 0
            img = mean + jnp.exp(0.5 * log_var) * noise
            return (img, x_start, k), (img if return_all_timesteps else None)

        (img, _, _), steps = jax.lax.scan(body, (img0, xs0, k_loop), ts)
        if return_all_timesteps:
            all_imgs = jnp.concatenate(
                [img0[:, None], jnp.swapaxes(steps, 0, 1)], axis=1)
            return self.unnormalize(all_imgs)
        return self.unnormalize(img)

    def sample(
        self,
        params,
        key,
        batch_size: Optional[int] = None,
        classes=None,
        *,
        cond_scale: float = 6.0,
        rescaled_phi: float = 0.7,
    ):
        if batch_size is None:
            assert classes is not None
            batch_size = classes.shape[0]
        shape = (batch_size, self.image_size, self.image_size, self.channels)
        fn = self.ddim_sample if self.is_ddim_sampling else self.p_sample_loop
        return fn(
            params, key, shape, classes,
            cond_scale=cond_scale, rescaled_phi=rescaled_phi,
        )

    def interpolate(
        self, params, key, x1, x2, classes=None, t: Optional[int] = None,
        lam: float = 0.5,
    ):
        """Spherical-ish latent interpolation (reference cfg.py:848-863)."""
        t = self.timesteps - 1 if t is None else t
        k_q1, k_q2, k_loop = jax.random.split(key, 3)
        tb = jnp.full((x1.shape[0],), t, jnp.int32)
        xt1 = dm.q_sample(self.schedule, self.normalize(x1), tb,
                          jax.random.normal(k_q1, x1.shape, jnp.float32))
        xt2 = dm.q_sample(self.schedule, self.normalize(x2), tb,
                          jax.random.normal(k_q2, x2.shape, jnp.float32))
        img0 = (1 - lam) * xt1 + lam * xt2

        ts = jnp.arange(t - 1, -1, -1, dtype=jnp.int32)

        def body(carry, tcur):
            img, k = carry
            tb = jnp.full((img.shape[0],), tcur, jnp.int32)
            _, x_start = self.model_predictions(
                params, img, tb, classes, cond_scale=1.0
            )
            x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = dm.q_posterior(self.schedule, x_start, img, tb)
            k, kn = jax.random.split(k)
            noise = jnp.where(
                tcur > 0, jax.random.normal(kn, img.shape, jnp.float32), 0.0
            )
            return (mean + jnp.exp(0.5 * log_var) * noise, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), ts)
        return self.unnormalize(img)
