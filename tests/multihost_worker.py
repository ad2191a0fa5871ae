"""Worker process for the 2-process × 4-device CPU multi-host test.

Run (by tests/test_multihost.py, one subprocess per process index):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python tests/multihost_worker.py <port> <process_id>

Forms a 2-process JAX distributed runtime over localhost, builds the REAL
LDM train step (training/ldm_step.py) on a global 8-device 'data' mesh, runs
two steps on a deterministic global batch (each process feeding only its
local half via make_global_array), and prints one JSON line of replicated
scalars for the parent to compare against a single-process run.
"""

import json
import os
import sys


def build():
    """Tiny-but-real LDM training setup; deterministic, process-independent.
    Shared with tests/test_multihost.py for the single-process reference."""
    import jax
    import jax.numpy as jnp

    from vqgan_tpu.diffusion import GaussianDiffusion
    from vqgan_tpu.models import CFGUnet
    from vqgan_tpu.training import (
        LDMTrainState,
        make_ldm_optimizer,
        make_ldm_train_step,
    )

    model = CFGUnet(dim=8, num_classes=4, dim_mults=(1, 2), channels=4,
                    attn_heads=1, attn_dim_head=8)
    x0 = jnp.zeros((8, 8, 8, 4))
    params = model.init({"params": jax.random.PRNGKey(0)}, x0,
                        jnp.zeros((8,), jnp.int32), jnp.zeros((8,), jnp.int32),
                        cond_drop_mask=jnp.zeros((8,), bool))

    def model_apply(p, x, t, classes, cond_drop_mask=None,
                    cond_drop_prob=None, rng=None, return_features=False):
        rngs = {"cond_drop": rng} if rng is not None else None
        return model.apply(p, x, t, classes, cond_drop_mask=cond_drop_mask,
                           cond_drop_prob=cond_drop_prob, rngs=rngs,
                           return_features=return_features)

    diffusion = GaussianDiffusion(
        model_apply, image_size=8, channels=4, timesteps=20,
        objective="pred_v", auto_normalize=False)
    tx = make_ldm_optimizer(learning_rate=1e-3)
    step_fn = make_ldm_train_step(diffusion, tx, donate=False)

    state = LDMTrainState(
        step=jnp.asarray(0), params=params, opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params))

    import numpy as np

    latents = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4)))
    classes = np.arange(8, dtype=np.int32) % 4
    return step_fn, state, latents, classes, jax.random.PRNGKey(42)


def run_steps(step_fn, state, latents_dev, classes_dev, rng, n=2):
    import jax
    import jax.numpy as jnp

    for _ in range(n):
        state, log = step_fn(state, latents_dev, classes_dev, rng)
    digest = jax.jit(
        lambda p: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(p)))(
            state.params)
    return log, digest


def _scalar(x) -> float:
    """Fetch a replicated global scalar (works when some shards live on
    other processes)."""
    return float(x.addressable_shards[0].data)


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

    import jax

    from vqgan_tpu.parallel import (
        barrier,
        initialize_distributed,
        is_main_process,
        make_global_array,
        make_mesh,
        process_local_batch_size,
        replicate,
    )

    got = initialize_distributed(f"127.0.0.1:{port}", num_processes=2,
                                 process_id=pid)
    assert got == pid == jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_devices()
    assert jax.device_count() == 8
    assert is_main_process() == (pid == 0)

    mesh = make_mesh()  # ('data'=8, 'model'=1), spans both processes
    step_fn, state, latents, classes, rng = build()
    state = replicate(state, mesh)

    # each process loads ONLY its slice of the global batch (the
    # reference's DistributedSampler semantics)
    local_bs = process_local_batch_size(8)
    assert local_bs == 4
    lo = pid * local_bs
    batch = make_global_array(
        {"latents": latents[lo:lo + local_bs],
         "classes": classes[lo:lo + local_bs]}, mesh)
    assert batch["latents"].shape == (8, 8, 8, 4)  # global shape

    log, digest = run_steps(step_fn, state, batch["latents"],
                            batch["classes"], rng)
    barrier("post-train")

    # FSDP across hosts: the SAME step with params + Adam moments + EMA
    # sharded over the 8-device 'data' axis spanning both processes —
    # placement via place_state's multi-process path; must reproduce the
    # replicated run exactly (same init, data, rng)
    from vqgan_tpu.parallel.fsdp import place_state

    _, state_f, _, _, _ = build()
    state_f = place_state(state_f, mesh, "fsdp", min_size=128)
    log_f, digest_f = run_steps(step_fn, state_f, batch["latents"],
                                batch["classes"], rng)
    barrier("post-fsdp")

    print("RESULT=" + json.dumps({
        "pid": pid,
        "loss": _scalar(log["loss"]),
        "grad_norm": _scalar(log["grad_norm"]),
        "param_digest": _scalar(digest),
        "fsdp_loss": _scalar(log_f["loss"]),
        "fsdp_param_digest": _scalar(digest_f),
    }), flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
