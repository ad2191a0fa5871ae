"""Fused vector-quantization lookup for TPU.

Replaces the reference's three-kernel CUDA sequence (pairwise-distance matmul
→ argmin → embedding gather, /root/reference/vqgan_ldm_baseline/models/
quantizer.py:68-80) with ONE Pallas kernel:

- distances via ‖z‖² + ‖e‖² − 2·z·Eᵀ with the matmul on the MXU and fp32
  accumulation,
- running argmin over codebook tiles (the [N, K] score matrix never
  materializes in HBM — that 2×N·K·4-byte round trip is what makes the XLA
  path HBM-bound; first-occurrence tie-breaking matches torch.argmin). On
  the fast path the min+argmin collapses into ONE packed int32 reduction
  (see _vq_kernel),
- code-usage tracking (the collapse monitor the reference computes
  separately via bincount, quantizer.py:134-149) — an O(N) XLA scatter-add
  on the indices by default, or fused into the kernel with fuse_usage=True.

The row gather (z_q = E[idx]) runs OUTSIDE the kernel as an XLA take: it is
an O(N·D) memory op there, while an in-kernel one-hot matmul would double
the MXU work (measured 1.7x slower at K=8192).

Gradient contract (custom_vjp): z_q is differentiable w.r.t. the codebook
(scatter-add of cotangents into the selected rows) and has zero gradient to
z — the straight-through estimator and the codebook/commitment losses are
composed OUTSIDE in plain jnp (see models/vq_vae.py), exactly mirroring the
reference's autograd semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "auto_use_kernel",
    "vq_lookup",
    "vq_lookup_reference",
    "codebook_usage",
    "ema_codebook_update",
    "revive_dead_codes",
]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# reference (pure jnp) path — used on CPU and as the parity oracle
# ---------------------------------------------------------------------------


def _vq_forward_reference(z: jax.Array, codebook: jax.Array):
    """z: [N, D], codebook: [K, D] → (z_q [N, D], indices [N] int32)."""
    z32 = z.astype(jnp.float32)
    e32 = codebook.astype(jnp.float32)
    d = (
        jnp.sum(z32**2, axis=1, keepdims=True)
        + jnp.sum(e32**2, axis=1)
        - 2.0 * jnp.dot(z32, e32.T, preferred_element_type=jnp.float32)
    )
    indices = jnp.argmin(d, axis=1).astype(jnp.int32)
    z_q = jnp.take(codebook, indices, axis=0)
    return z_q, indices


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _vq_kernel(z_ref, e_ref, esq_ref, idx_ref, *out_refs, block_k,
               n_actual, block_n, exact, fuse_usage):
    """One program per z tile: [BN, D] against the full codebook in VMEM.

    The score matmul runs on the MXU in the input dtype (bf16 on the fast
    path — one MXU pass with fp32 accumulation, the same effective precision
    XLA uses for fp32 dots at its DEFAULT matmul precision) and the VPU work
    is kept to the bare minimum that the argmin actually needs:

    - ‖e‖² is precomputed OUTSIDE (one tiny XLA reduction) instead of being
      rederived from the codebook by every grid program;
    - ‖z‖² is omitted on the fast path: it is constant per row, so
      argmin_k(‖z‖² + ‖e_k‖² − 2z·e_k) == argmin_k(‖e_k‖² − 2z·e_k). The
      `exact` (fp32) path keeps it so scores round exactly like the jnp
      reference;
    - padded codebook rows carry +inf in the precomputed ‖e‖², so no
      in-kernel padding mask is ever needed;
    - the usage histogram (N·K one-hot compares on the VPU — comparable cost
      to the distance matmul itself, since the VPU is ~100× slower per op
      than the MXU) is opt-in; the wrapper defaults to an XLA scatter-add
      on the [N] indices instead, which is O(N).
    """
    bn = z_ref.shape[0]
    k_padded = e_ref.shape[0]
    num_kb = k_padded // block_k
    # padded codebook rows need no in-kernel mask: their precomputed ‖e‖²
    # slot is +inf, so they can never win the argmin

    idx_bits = max(1, (k_padded - 1).bit_length())
    idx_mask = (1 << idx_bits) - 1
    use_packed = (not exact) and idx_bits <= 16

    if exact:
        z32 = z_ref[:].astype(jnp.float32)
        z_sq = jnp.sum(z32 * z32, axis=1, keepdims=True)  # [BN, 1]

    def tile_dist(i):
        cross = jax.lax.dot_general(
            z_ref[:], e_ref[pl.ds(i * block_k, block_k), :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BN, BK]
        e_sq = esq_ref[0, pl.ds(i * block_k, block_k)][None, :]
        if exact:
            # same association as the jnp reference: (‖z‖² + ‖e‖²) − 2z·e
            return (z_sq + e_sq) - 2.0 * cross
        return e_sq - 2.0 * cross

    if use_packed:
        # Packed min+argmin in ONE integer reduction: map each fp32 score to
        # a monotonic signed int32 (negatives xor 0x7FFFFFFF), truncate the
        # low idx_bits of its mantissa, and splice the global column index
        # into those bits. A single jnp.min then yields both the (quantized)
        # min distance and — in the low bits — the argmin, with ties inside
        # one quantum broken toward the LOWEST index, matching torch.argmin's
        # first-occurrence rule. Dropping 13 bits at K=8192 leaves 10
        # mantissa bits, still finer than the bf16 rounding the fast path's
        # cross-term already carries. Measured: 744 µs vs 1075 µs for the
        # min+argmin+two-select formulation at the same blocks (N=K=8192).
        def find_body(i, best_p):
            bits = jax.lax.bitcast_convert_type(tile_dist(i), jnp.int32)
            m = jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)
            col = (jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
                   + i * block_k)
            p = (m & jnp.int32(~idx_mask)) | col
            return jnp.minimum(best_p, jnp.min(p, axis=1, keepdims=True))

        best_p0 = jnp.full((bn, 1), jnp.iinfo(jnp.int32).max, jnp.int32)
        best_p = jax.lax.fori_loop(0, num_kb, find_body, best_p0)
        best_i = best_p & idx_mask
    else:
        def find_body(i, carry):
            best_d, best_i = carry
            dist = tile_dist(i)
            tile_min = jnp.min(dist, axis=1, keepdims=True)
            tile_arg = (jnp.argmin(dist, axis=1).astype(jnp.int32)[:, None]
                        + i * block_k)
            take = tile_min < best_d
            return (jnp.where(take, tile_min, best_d),
                    jnp.where(take, tile_arg, best_i))

        best_d0 = jnp.full((bn, 1), jnp.inf, jnp.float32)
        best_i0 = jnp.zeros((bn, 1), jnp.int32)
        _, best_i = jax.lax.fori_loop(0, num_kb, find_body,
                                      (best_d0, best_i0))
    idx_ref[:] = best_i  # [BN, 1]

    if not fuse_usage:
        return

    # fused usage histogram, accumulated across sequential grid programs,
    # tiled over the codebook axis to keep the one-hot in a [BN, BK] tile
    (usage_ref,) = out_refs
    idx = best_i[:, 0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        usage_ref[:] = jnp.zeros_like(usage_ref)

    row = jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0) + pid * block_n
    valid = row < n_actual  # [BN, 1]

    def usage_body(i, _):
        kcol = jax.lax.broadcasted_iota(jnp.int32, (bn, block_k), 1) \
            + i * block_k
        onehot = jnp.logical_and(kcol == idx[:, None], valid)
        usage_ref[0, pl.ds(i * block_k, block_k)] += jnp.sum(
            onehot.astype(jnp.int32), axis=0)
        return 0

    jax.lax.fori_loop(0, num_kb, usage_body, 0)


_VMEM_BUDGET_BYTES = 15 * 1024 * 1024  # just under the 16M scoped cap (the
# estimator below is deliberately tight: the measured-fastest (512, 4096)
# config at K=8192 sits at ~14.3M estimated)


def _pick_blocks(n: int, k_pad: int, d: int, block_n: int, block_k: int,
                 in_bytes: int):
    """Shrink (block_n, block_k) until the kernel's VMEM residency fits:
    full codebook + ‖e‖² row + z block + the fp32 score tile (the packed /
    compare tiles reuse its registers — Mosaic fuses the elementwise chain,
    measured: a [512, 4096] tile compiles at ~1.25× its own bytes)."""
    codebook_bytes = k_pad * d * in_bytes + k_pad * 4
    while True:
        per_program = (
            block_n * d * in_bytes            # z block
            + (5 * block_n * block_k * 4) // 4  # score tile × 1.25
            + k_pad * 4                       # usage output row (when fused)
        )
        if codebook_bytes + per_program <= _VMEM_BUDGET_BYTES:
            return block_n, block_k
        if block_k > 512:
            block_k //= 2
        elif block_n > 128:
            block_n //= 2
        elif block_k > 128:
            block_k //= 2
        else:
            return block_n, block_k  # minimal tiles; let the compiler try


def _vq_forward_pallas(
    z: jax.Array,
    codebook: jax.Array,
    block_n: int = 512,
    block_k: int = 4096,
    interpret: bool = False,
    mxu_bf16: bool = True,
    fuse_usage: bool = False,
):
    n, d = z.shape
    k = codebook.shape[0]
    in_dtype = jnp.bfloat16 if mxu_bf16 else jnp.float32

    block_k = min(block_k, _round_up(k, 128))
    block_n = min(block_n, _round_up(n, 8))
    block_n, block_k = _pick_blocks(
        n, _round_up(k, block_k), d, block_n, block_k,
        jnp.dtype(in_dtype).itemsize)
    n_pad = _round_up(n, block_n)
    k_pad = _round_up(k, block_k)

    # ‖e‖² hoisted out of the kernel: one O(K·D) XLA reduction, always fp32
    # from the fp32 codebook (exact even on the bf16 path). Padded rows get
    # +inf so they can never win the argmin without an in-kernel mask.
    e32 = codebook.astype(jnp.float32)
    e_sq = jnp.sum(e32 * e32, axis=1)[None, :]  # [1, K]
    if k_pad != k:
        e_sq = jnp.pad(e_sq, ((0, 0), (0, k_pad - k)),
                       constant_values=jnp.inf)

    zp = z.astype(in_dtype)
    ep = codebook.astype(in_dtype)
    if n_pad != n:
        zp = jnp.pad(zp, ((0, n_pad - n), (0, 0)))
    if k_pad != k:
        ep = jnp.pad(ep, ((0, k_pad - k), (0, 0)))

    grid = (n_pad // block_n,)
    kernel = functools.partial(
        _vq_kernel, block_k=block_k, n_actual=n, block_n=block_n,
        exact=not mxu_bf16, fuse_usage=fuse_usage,
    )
    out_specs = [
        pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((n_pad, 1), jnp.int32)]
    if fuse_usage:
        out_specs.append(pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, k_pad), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * k_pad * d,
            bytes_accessed=(n_pad * d + k_pad * d) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(zp, ep, e_sq)
    # row gather stays outside: XLA's take is a cheap O(N·D) memory op while
    # an in-kernel one-hot matmul would DOUBLE the MXU work (measured 1.7x
    # slower at K=8192)
    idx = out[0][:n, 0]
    z_q = jnp.take(codebook, idx, axis=0)
    if fuse_usage:
        usage = out[1][0, :k]
    else:
        usage = codebook_usage(idx, k)
    return z_q, idx, usage


# ---------------------------------------------------------------------------
# public differentiable op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def vq_lookup(z, codebook, use_kernel: str | bool = "auto",
              interpret: bool = False):
    """Nearest-codebook lookup. z: [N, D], codebook: [K, D].

    use_kernel: "auto" (shape-dispatched per the measured policy in
    `auto_use_kernel`, env-overridable), True (Pallas, bf16 MXU cross-term —
    the fast path), "fp32" (Pallas, exact fp32 distances), False (XLA).

    Returns (z_q [N, D], indices [N] int32, usage [K] int32).
    z_q carries gradient to `codebook` only (scatter-add); compose the
    straight-through estimator outside.
    """
    out, _ = _vq_fwd(z, codebook, use_kernel, interpret)
    return out


def auto_use_kernel(num_codes: int, on_tpu: bool | None = None) -> bool:
    """The measured dispatch policy for use_kernel="auto" (v5e, N=8192,
    D=256, cli/bench_vq.py + component probes):

      XLA path:  HBM-bound. The [N, K] fp32 score matrix round-trips
                 HBM (2·N·K·4 B = 536 MB at K=8192 ≈ 655 µs at
                 819 GB/s); measured 858 µs end-to-end. XLA's bare
                 bf16 dot+reduce on the same shape measures 862 µs —
                 the argmin itself is fully hidden behind the traffic.
      kernel:    MXU-bound. Scores never leave VMEM; the floor is the
                 distance matmul at the short D=256 contraction
                 (~640 µs ≈ 27% of bf16 peak — pipeline-fill bound,
                 layout-independent: NT vs NN transposed codebook
                 measured equal) + ~80 µs packed argmin + take.
                 Measured 879 µs end-to-end at K=8192; 586 µs at
                 K=1024 (1.27× over XLA) and 977 µs at K=16384 (1.09×).

    Policy: the kernel wins where the XLA score traffic is small enough to
    leave it matmul-bound (K ≤ 2048) and where the traffic is so large the
    VMEM-resident scores dominate (K ≥ 16384); at the reference config
    (K=8192) the two sit on their respective rooflines in a statistical
    tie, and XLA stays the default there because embedding the Pallas
    custom call in the big training backward costs ~6 min of extra compile
    through this environment's remote Mosaic pipeline (375 s vs 19 s
    measured on the full VQ-VAE backward). Env overrides both ways:
    VQGAN_TPU_VQ_KERNEL=1 forces the kernel, =0 forces XLA.

    Off-TPU (the CPU test platform) the Mosaic kernel can only run in
    interpret mode, so auto always resolves to XLA there.
    """
    import os

    env = os.environ.get("VQGAN_TPU_VQ_KERNEL")
    if env in ("0", "1"):
        return env == "1"
    if on_tpu is None:
        on_tpu = jax.devices()[0].platform == "tpu"
    return on_tpu and (num_codes <= 2048 or num_codes >= 16384)


def _dispatch(z, codebook, use_kernel, interpret):
    if use_kernel == "auto":
        use_kernel = auto_use_kernel(codebook.shape[0],
                                     on_tpu=True if interpret else None)
    if use_kernel:
        return _vq_forward_pallas(z, codebook, interpret=interpret,
                                  mxu_bf16=(use_kernel != "fp32"))
    z_q, idx = _vq_forward_reference(z, codebook)
    usage = codebook_usage(idx, codebook.shape[0])
    return z_q, idx, usage


def _vq_fwd(z, codebook, use_kernel, interpret):
    z_q, idx, usage = _dispatch(z, codebook, use_kernel, interpret)
    return (z_q, idx, usage), (idx, codebook.shape[0])


def _vq_bwd(use_kernel, interpret, res, g):
    g_zq, _, _ = g
    idx, k = res
    g_codebook = jnp.zeros((k, g_zq.shape[1]), g_zq.dtype).at[idx].add(g_zq)
    return jnp.zeros((idx.shape[0], g_zq.shape[1]), g_zq.dtype), g_codebook


vq_lookup.defvjp(_vq_fwd, _vq_bwd)


def vq_lookup_reference(z, codebook):
    """Differentiability-free jnp oracle for tests."""
    return _vq_forward_reference(z, codebook)


def codebook_usage(indices: jax.Array, num_embeddings: int) -> jax.Array:
    """Per-code use counts (bincount with static length)."""
    return jnp.zeros((num_embeddings,), jnp.int32).at[
        indices.reshape(-1)
    ].add(1)


def revive_dead_codes(
    codebook: jax.Array,
    usage_counts: jax.Array,
    z: jax.Array,
    rng: jax.Array,
    threshold: int = 1,
):
    """Re-initialize under-used codes to random encoder outputs.

    The codebook-collapse fix from the utilization literature (e.g.
    VQGAN-LC, arXiv 2406.11837: dead codes re-anchored to encoder features;
    also standard in VQ-VAE-2 training recipes): any code whose accumulated
    `usage_counts` (e.g. summed over the steps since the last revival) is
    below `threshold` is replaced by a row of `z` drawn uniformly at random
    — placing it in a populated region of encoder space so it wins lookups
    again. The reference monitors utilization (quantizer.py:134-149) but
    has no revival; this is the corresponding intervention, off by default
    (`VQGANConfig.revive_dead_codes_every`).

    codebook: [K, D]; usage_counts: [K] int; z: [N, D] (or any batch shape
    flattening to [N, D]) pre-quant encoder outputs.
    Returns (new_codebook, num_revived, dead_mask [K] bool). Fully jittable.
    """
    k, d = codebook.shape
    z2 = z.reshape(-1, z.shape[-1]).astype(codebook.dtype)
    assert z2.shape[-1] == d, (z.shape, codebook.shape)
    dead = usage_counts < threshold
    rows = jax.random.randint(rng, (k,), 0, z2.shape[0])
    replacement = jnp.take(z2, rows, axis=0)
    new_codebook = jnp.where(dead[:, None], replacement, codebook)
    return new_codebook, jnp.sum(dead.astype(jnp.int32)), dead


def ema_codebook_update(
    codebook: jax.Array,
    cluster_size: jax.Array,
    cluster_sum: jax.Array,
    z: jax.Array,
    indices: jax.Array,
    decay: float = 0.99,
    eps: float = 1e-5,
):
    """Optional EMA codebook update (VQ-VAE-2 style; the reference learns the
    codebook with Adam instead — quantizer.py has no EMA. Provided as a
    framework capability, off by default).

    Returns (new_codebook, new_cluster_size, new_cluster_sum).
    """
    k, d = codebook.shape
    onehot = jax.nn.one_hot(indices, k, dtype=jnp.float32)
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.dot(onehot.T, z.astype(jnp.float32),
                   preferred_element_type=jnp.float32)

    new_size = cluster_size * decay + counts * (1 - decay)
    new_sum = cluster_sum * decay + sums * (1 - decay)

    n = jnp.sum(new_size)
    smoothed = (new_size + eps) / (n + k * eps) * n
    new_codebook = (new_sum / smoothed[:, None]).astype(codebook.dtype)
    return new_codebook, new_size, new_sum
