"""RePaint inpainting (Lugmayr et al. 2022) on top of GaussianDiffusion.

Behavior target: /root/reference/denoising_diffusion_pytorch/repaint.py:
663-726 — at every ancestral step the known region is overwritten with the
forward-noised ground truth, the final step hard-pastes the ground truth, and
a resampling schedule (jump back `resample_jump` steps, `resample_iter`
times, every `resample_every` steps) re-harmonizes the boundary.

Known upstream quirk (documented, not replicated): the reference's inner
resample loop calls `p_sample(x, t=resample_jump)` with a CONSTANT t for all
j (repaint.py:722-724) instead of walking t back down — we implement the
published Algorithm 1 (renoise one β-step at a time up to the jump height,
then denoise back down through decreasing t).

TPU-native: the full denoise/renoise schedule is precomputed on the host as a
static (op, t) array and the whole sampler is ONE `lax.scan` — mask blending
and the renoise/denoise branch are `jnp.where` selects on the op code.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import diffusion_math as dm
from .gaussian import GaussianDiffusion

__all__ = ["RePaintDiffusion", "build_repaint_schedule"]

_OP_DENOISE = 0
_OP_RENOISE = 1


def build_repaint_schedule(
    timesteps: int,
    resample: bool = True,
    resample_iter: int = 10,
    resample_jump: int = 3,
    resample_every: int = 50,
) -> np.ndarray:
    """Static (op, t) schedule per RePaint Algorithm 1.

    op 0 = ancestral denoise at t; op 1 = single-β renoise from t to t+1.
    """
    ops = []
    for t in range(timesteps - 1, -1, -1):
        ops.append((_OP_DENOISE, t))
        if (
            resample
            and t > 0
            and (t % resample_every == 0 or t == 1)
        ):
            for _ in range(resample_iter):
                # jump up: renoise resample_jump single steps
                for j in range(resample_jump):
                    ops.append((_OP_RENOISE, t + j))
                # walk back down
                for j in range(resample_jump - 1, -1, -1):
                    ops.append((_OP_DENOISE, t + j))
    return np.asarray(ops, dtype=np.int32)


@dataclasses.dataclass
class RePaintDiffusion(GaussianDiffusion):
    resample: bool = True
    resample_iter: int = 10
    resample_jump: int = 3
    resample_every: int = 50

    def inpaint(
        self,
        params,
        key,
        gt: jax.Array,
        mask: jax.Array,
        *,
        classes=None,
        cond_scale: float = 1.0,
        clip_denoised: bool = True,
    ):
        """gt: [B, H, W, C] in data space ([0,1] if auto_normalize else
        model space); mask: broadcastable, 1 = KNOWN region."""
        shape = gt.shape
        gt_n = self.normalize(gt)
        sched = self.schedule

        ops = jnp.asarray(
            build_repaint_schedule(
                self.timesteps, self.resample, self.resample_iter,
                self.resample_jump, self.resample_every,
            )
        )

        k_init, k_loop = jax.random.split(key)
        img0 = jax.random.normal(k_init, shape, jnp.float32)

        def body(carry, op_t):
            img, k = carry
            op, t = op_t[0], op_t[1]
            tb = jnp.full((shape[0],), t, jnp.int32)
            k, k_blend, k_step = jax.random.split(k, 3)

            # --- denoise branch: blend known region, ancestral step -------
            ac = sched.alphas_cumprod[t]
            noised_gt = (
                jnp.sqrt(ac) * gt_n
                + jnp.sqrt(1 - ac)
                * jax.random.normal(k_blend, shape, jnp.float32)
            )
            img_blend = mask * noised_gt + (1 - mask) * img

            _, x_start = self.model_predictions(
                params, img_blend, tb, classes, cond_scale=cond_scale)
            if clip_denoised:
                x_start = jnp.clip(x_start, -1.0, 1.0)
            mean, _, log_var = dm.q_posterior(sched, x_start, img_blend, tb)
            noise = jax.random.normal(k_step, shape, jnp.float32)
            denoised = mean + jnp.exp(0.5 * log_var) * jnp.where(
                t > 0, noise, 0.0)
            # final step: hard paste of ground truth into the known region
            denoised = jnp.where(
                t == 0, mask * gt_n + (1 - mask) * denoised, denoised)

            # --- renoise branch -------------------------------------------
            # after DENOISE at t the state sits at level t-1; the RENOISE op
            # recorded with value t ascends x_{t-1} → x_t, which uses β_t
            beta = sched.betas[jnp.minimum(t, self.timesteps - 1)]
            renoised = (
                jnp.sqrt(1 - beta) * img
                + jnp.sqrt(beta) * jax.random.normal(k_step, shape, jnp.float32)
            )

            img = jnp.where(op == _OP_RENOISE, renoised, denoised)
            return (img, k), None

        (img, _), _ = jax.lax.scan(body, (img0, k_loop), ops)
        return self.unnormalize(img)
