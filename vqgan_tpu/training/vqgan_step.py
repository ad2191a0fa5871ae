"""The jitted two-optimizer VQ-GAN training step.

Behavior target: the reference's alternating G/D loop
(/root/reference/vqgan_ldm_baseline/train_vqgan.py:240-296) — generator step
on L1 + LPIPS + vq_loss (+ hinge-G after disc_start), discriminator step on
detached reconstructions after disc_start, both with grad clipping.

TPU-native design: ONE compiled step function updates both optimizer states.
The disc_start gate is a traced predicate (`step >= disc_start`) feeding
`lax.cond`-style masked updates, so the step count stays inside the program
and the same executable serves the whole schedule — no recompilation at the
phase switch. The discriminator pass runs on `stop_gradient(recon)` exactly
like the reference's `.detach()`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..losses.gan import (
    adaptive_disc_weight,
    discriminator_loss,
    generator_loss,
)

__all__ = [
    "VQGANTrainState",
    "make_vqgan_train_step",
    "make_vqgan_split_steps",
    "make_vqgan_scan_steps",
    "make_gan_optimizers",
    "reset_codebook_moments",
]


def reset_codebook_moments(opt_state, dead_mask):
    """Zero the Adam moments of revived codebook rows (ops.vq.
    revive_dead_codes): a revived code's stale mu/nu would immediately drag
    it away from its new anchor. Matches the moment leaves by their
    param-tree path (...'quantizer' → 'embedding'); optax moment trees
    mirror the param tree, so the path rule covers every chain element."""

    def fix(path, leaf):
        names = [str(getattr(p, "key", "")) for p in path]
        if (names and names[-1] == "embedding" and "quantizer" in names
                and getattr(leaf, "ndim", 0) == 2):
            return jnp.where(dead_mask[:, None], jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, opt_state)


class VQGANTrainState(flax.struct.PyTreeNode):
    step: jax.Array
    vqvae_params: Any
    disc_params: Any
    disc_stats: Any  # BatchNorm running stats ({} when norm != "batch")
    opt_g: optax.OptState
    opt_d: optax.OptState


def make_gan_optimizers(
    learning_rate: float = 4.5e-5,
    disc_learning_rate: float = 4.5e-5,
    betas: Tuple[float, float] = (0.5, 0.9),
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
    gradient_accumulate_every: int = 1,
):
    """Two Adam chains with clipping (reference train_vqgan.py:178-190,
    vqgan_config.py:86-90). gradient_accumulate_every > 1 wraps both in
    optax.MultiSteps — grads average over k micro-batches, the update
    applies on the k-th (the same mechanism as the LDM path,
    ldm_step.py:59)."""

    def chain(lr):
        parts = []
        if max_grad_norm is not None:
            parts.append(optax.clip_by_global_norm(max_grad_norm))
        if weight_decay > 0:
            parts.append(optax.adamw(lr, b1=betas[0], b2=betas[1],
                                     weight_decay=weight_decay))
        else:
            parts.append(optax.adam(lr, b1=betas[0], b2=betas[1]))
        tx = optax.chain(*parts)
        if gradient_accumulate_every > 1:
            tx = optax.MultiSteps(tx, gradient_accumulate_every)
        return tx

    return chain(learning_rate), chain(disc_learning_rate)


def _make_phases(
    vqvae_apply: Callable,
    disc_apply: Callable,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    *,
    disc_start: int,
    disc_weight: float,
    perceptual_weight: float,
    disc_loss_type: str,
    perceptual_fn: Optional[Callable],
    use_adaptive_weight: bool,
    last_layer_path: Tuple[str, ...],
):
    """The G and D update phases, shared between the fused single-program
    step and the split two-program step (which the trainer and bench use —
    same math, two smaller XLA programs that compile minutes not hours on
    this environment's remote TPU compiler)."""

    def _get_leaf(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    def g_phase(state: VQGANTrainState, images: jax.Array):
        disc_active = state.step >= disc_start

        def g_loss_fn(vq_params):
            recon, loss_dict, indices = vqvae_apply(vq_params, images)
            logits_fake, _ = disc_apply(
                state.disc_params, state.disc_stats, recon, train=False)

            adaptive = None
            if use_adaptive_weight:
                # ‖∇_w nll‖ / ‖∇_w g‖ at the decoder output conv — two
                # targeted backward passes (reference losses.py:63-94)
                def nll_of(p):
                    r, _, _ = vqvae_apply(p, images)
                    l1 = jnp.mean(jnp.abs(images - r))
                    p_l = (jnp.mean(perceptual_fn(r, images))
                           if perceptual_fn is not None else 0.0)
                    return l1 + perceptual_weight * p_l

                def g_of(p):
                    r, _, _ = vqvae_apply(p, images)
                    lf, _ = disc_apply(
                        state.disc_params, state.disc_stats, r, train=False)
                    return -jnp.mean(lf)

                nll_g = _get_leaf(jax.grad(nll_of)(vq_params), last_layer_path)
                gan_g = _get_leaf(jax.grad(g_of)(vq_params), last_layer_path)
                adaptive = adaptive_disc_weight(
                    jnp.linalg.norm(nll_g), jnp.linalg.norm(gan_g))

            gan_total, log = generator_loss(
                images, recon, logits_fake,
                disc_active=disc_active,
                disc_weight=disc_weight,
                perceptual_weight=perceptual_weight,
                disc_loss_type=disc_loss_type,
                perceptual_fn=perceptual_fn,
                adaptive_weight=adaptive,
            )
            total = gan_total + loss_dict["vq_loss"]
            log = {**log, **loss_dict, "loss_total": total}
            return total, (recon, log)

        (g_total, (recon, g_log)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.vqvae_params)
        g_updates, new_opt_g = opt_g.update(
            g_grads, state.opt_g, state.vqvae_params)
        new_vq_params = optax.apply_updates(state.vqvae_params, g_updates)
        return new_vq_params, new_opt_g, recon, g_log, disc_active

    def d_phase(state: VQGANTrainState, images: jax.Array,
                recon: jax.Array, disc_active):
        """Unmasked D update on detached reconstructions (the caller decides
        whether/how to gate on disc_start)."""
        recon_sg = jax.lax.stop_gradient(recon)

        def d_loss_fn(d_params):
            logits_real, new_stats = disc_apply(
                d_params, state.disc_stats, images, train=True)
            logits_fake, new_stats = disc_apply(
                d_params, new_stats, recon_sg, train=True)
            d_loss, d_log = discriminator_loss(
                logits_real, logits_fake,
                disc_active=disc_active, disc_loss_type=disc_loss_type)
            return d_loss, (d_log, new_stats)

        (d_total, (d_log, new_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.disc_params)
        d_updates, new_opt_d = opt_d.update(
            d_grads, state.opt_d, state.disc_params)
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)
        return new_disc_params, new_stats, new_opt_d, d_log

    return g_phase, d_phase


def _compile_options(fast_compile: bool):
    # fast_compile: this environment's TPU compiler spends 10x+ longer in
    # exec-time optimization search on big conv backward graphs (measured
    # 742s → 68s on the LPIPS grad alone); dialing the effort down trades a
    # few % step time for minute-scale compiles.
    return {"exec_time_optimization_effort": -1.0} if fast_compile else None


def make_vqgan_train_step(
    vqvae_apply: Callable,
    disc_apply: Callable,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    *,
    disc_start: int = 10000,
    disc_weight: float = 0.1,
    perceptual_weight: float = 1.0,
    disc_loss_type: str = "hinge",
    perceptual_fn: Optional[Callable] = None,
    use_adaptive_weight: bool = False,
    last_layer_path: Tuple[str, ...] = ("params", "decoder", "conv_out",
                                        "kernel"),
    donate: bool = True,
    fast_compile: bool = False,
):
    """Build the fused G+D train step (ONE compiled program; the disc_start
    gate is a traced predicate feeding masked updates).

    vqvae_apply(params, images) -> (recon, loss_dict, indices)
    disc_apply(params, stats, images, train) -> (logits, new_stats)
    """
    g_phase, d_phase = _make_phases(
        vqvae_apply, disc_apply, opt_g, opt_d,
        disc_start=disc_start, disc_weight=disc_weight,
        perceptual_weight=perceptual_weight, disc_loss_type=disc_loss_type,
        perceptual_fn=perceptual_fn, use_adaptive_weight=use_adaptive_weight,
        last_layer_path=last_layer_path)

    def train_step(state: VQGANTrainState, images: jax.Array):
        new_vq_params, new_opt_g, recon, g_log, disc_active = g_phase(
            state, images)
        d_params_cand, d_stats_cand, opt_d_cand, d_log = d_phase(
            state, images, recon, disc_active)

        # freeze D (params, opt state, BN stats) until disc_start — masked
        # update keeps everything in one compiled program
        select = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(disc_active, n, o), new, old)
        new_state = state.replace(
            step=state.step + 1,
            vqvae_params=new_vq_params,
            disc_params=select(d_params_cand, state.disc_params),
            disc_stats=select(d_stats_cand, state.disc_stats),
            opt_g=new_opt_g,
            opt_d=select(opt_d_cand, state.opt_d),
        )
        return new_state, {**g_log, **d_log}

    return jax.jit(train_step, donate_argnums=(0,) if donate else (),
                   compiler_options=_compile_options(fast_compile))


def make_vqgan_split_steps(
    vqvae_apply: Callable,
    disc_apply: Callable,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    *,
    disc_start: int = 10000,
    disc_weight: float = 0.1,
    perceptual_weight: float = 1.0,
    disc_loss_type: str = "hinge",
    perceptual_fn: Optional[Callable] = None,
    use_adaptive_weight: bool = False,
    last_layer_path: Tuple[str, ...] = ("params", "decoder", "conv_out",
                                        "kernel"),
    donate: bool = True,
    fast_compile: bool = False,
):
    """Build the split two-program step: `(g_step, d_step)`.

    Same one-step semantics as `make_vqgan_train_step`, but as two XLA
    programs dispatched back-to-back. This is the trainer's production path:
    the two smaller backward graphs compile in minutes where the fused
    program takes hour-scale through this environment's remote TPU compiler,
    AND the host can skip dispatching `d_step` entirely before `disc_start`
    (the reference also pays no D compute before then —
    /root/reference/vqgan_ldm_baseline/train_vqgan.py:274), where the fused
    step's masked update must compute-and-discard the D pass every step.

        g_step(state, images)        -> (state', recon_sg, g_log)
        d_step(state, images, recon) -> (state', d_log)

    `g_step` advances `state.step` and updates G; `d_step` updates D and is
    unmasked — callers gate the dispatch on `step >= disc_start`.
    """
    g_phase, d_phase = _make_phases(
        vqvae_apply, disc_apply, opt_g, opt_d,
        disc_start=disc_start, disc_weight=disc_weight,
        perceptual_weight=perceptual_weight, disc_loss_type=disc_loss_type,
        perceptual_fn=perceptual_fn, use_adaptive_weight=use_adaptive_weight,
        last_layer_path=last_layer_path)

    def g_step(state: VQGANTrainState, images: jax.Array):
        new_vq_params, new_opt_g, recon, g_log, _ = g_phase(state, images)
        new_state = state.replace(
            step=state.step + 1, vqvae_params=new_vq_params,
            opt_g=new_opt_g)
        return new_state, jax.lax.stop_gradient(recon), g_log

    def d_step(state: VQGANTrainState, images: jax.Array, recon: jax.Array):
        new_disc_params, new_stats, new_opt_d, d_log = d_phase(
            state, images, recon, disc_active=True)
        new_state = state.replace(
            disc_params=new_disc_params, disc_stats=new_stats,
            opt_d=new_opt_d)
        return new_state, d_log

    options = _compile_options(fast_compile)
    donate_g = (0,) if donate else ()
    return (
        jax.jit(g_step, donate_argnums=donate_g, compiler_options=options),
        jax.jit(d_step, donate_argnums=donate_g, compiler_options=options),
    )


def make_vqgan_scan_steps(
    vqvae_apply: Callable,
    disc_apply: Callable,
    opt_g: optax.GradientTransformation,
    opt_d: optax.GradientTransformation,
    *,
    disc_start: int = 10000,
    disc_weight: float = 0.1,
    perceptual_weight: float = 1.0,
    disc_loss_type: str = "hinge",
    perceptual_fn: Optional[Callable] = None,
    use_adaptive_weight: bool = False,
    last_layer_path: Tuple[str, ...] = ("params", "decoder", "conv_out",
                                        "kernel"),
    donate: bool = True,
    fast_compile: bool = False,
):
    """Multi-step dispatch: ONE jitted program runs a whole block of full
    training steps via `lax.scan` over a superbatch of shape
    [block, B, H, W, C].

    Why: per-call jit dispatch on this environment's 1-core host costs a
    multi-ms floor per program (measured in `results/training_roofline.json`:
    g_step 40.5 ms dispatched vs 31.1 ms device-only inside a scan chain —
    49.4% vs 63.1% MFU). Scanning K steps inside one program amortizes the
    host round-trips to one per block, the same lever as the sampler's
    one-scan DDIM chain. The reference's host loop
    (/root/reference/vqgan_ldm_baseline/train_vqgan.py:240-296) pays this
    per step; on TPU the block is the natural dispatch unit.

    Semantics are step-for-step identical to `make_vqgan_split_steps`
    alternation (G update, then D update on that step's detached recon; the
    next iteration's G sees the updated D — pinned by
    tests/test_scan_step.py). The disc_start gate rides the in-carry step
    counter, so a block straddling disc_start behaves exactly like per-step
    dispatch (masked D update before the boundary, live after).

    Returns `(scan_gd, scan_g)`:

        scan_gd(state, superbatch) -> (state', stacked_logs)   # G+D each it.
        scan_g(state, superbatch)  -> (state', stacked_logs)   # G only

    `scan_gd` is correct at any step (masked D before disc_start, like the
    fused step); `scan_g` skips D compute entirely and is the cheap program
    for blocks that end before disc_start (step + block <= disc_start).
    Stacked logs have a leading [block] axis.
    """
    g_phase, d_phase = _make_phases(
        vqvae_apply, disc_apply, opt_g, opt_d,
        disc_start=disc_start, disc_weight=disc_weight,
        perceptual_weight=perceptual_weight, disc_loss_type=disc_loss_type,
        perceptual_fn=perceptual_fn, use_adaptive_weight=use_adaptive_weight,
        last_layer_path=last_layer_path)

    def one_gd(state: VQGANTrainState, images: jax.Array):
        new_vq_params, new_opt_g, recon, g_log, disc_active = g_phase(
            state, images)
        state = state.replace(
            step=state.step + 1, vqvae_params=new_vq_params,
            opt_g=new_opt_g)
        d_params_cand, d_stats_cand, opt_d_cand, d_log = d_phase(
            state, images, jax.lax.stop_gradient(recon), disc_active)
        select = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(disc_active, n, o), new, old)
        state = state.replace(
            disc_params=select(d_params_cand, state.disc_params),
            disc_stats=select(d_stats_cand, state.disc_stats),
            opt_d=select(opt_d_cand, state.opt_d))
        return state, {**g_log, **d_log}

    def one_g(state: VQGANTrainState, images: jax.Array):
        new_vq_params, new_opt_g, _recon, g_log, _ = g_phase(state, images)
        return state.replace(
            step=state.step + 1, vqvae_params=new_vq_params,
            opt_g=new_opt_g), g_log

    def scan_gd(state: VQGANTrainState, superbatch: jax.Array):
        return jax.lax.scan(one_gd, state, superbatch)

    def scan_g(state: VQGANTrainState, superbatch: jax.Array):
        return jax.lax.scan(one_g, state, superbatch)

    options = _compile_options(fast_compile)
    dn = (0,) if donate else ()
    return (
        jax.jit(scan_gd, donate_argnums=dn, compiler_options=options),
        jax.jit(scan_g, donate_argnums=dn, compiler_options=options),
    )
