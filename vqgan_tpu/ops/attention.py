"""Fused attention for TPU: Pallas flash-attention forward with a
memory-light custom-VJP backward, plus a pure-jnp reference.

Replaces the reference's `Attend` SDPA/einsum wrapper
(/root/reference/denoising_diffusion_pytorch/attend.py:39-125) with a
TPU-native design:

- One Pallas kernel per (batch·head, q-block): K/V tiles stream through VMEM,
  scores never round-trip to HBM, softmax accumulates in fp32 while matmuls
  feed the MXU in the input dtype (bf16 in production).
- The kernel also emits the log-sum-exp rows, so the backward pass recomputes
  probabilities instead of storing the S×S score matrix.
- All sequence lengths are padded to lane multiples; padding is masked with
  -inf inside the kernel.

API shape convention: [batch, seq, heads, head_dim] (BSHD).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["sdpa", "sdpa_reference", "flash_attention"]

_NEG_INF = -1e30


def sdpa_reference(q, k, v, scale: float | None = None):
    """Plain softmax attention, fp32 accumulation. [B, S, H, D] layout."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_BUDGET = 13 * 1024 * 1024  # of the ~16 MB scoped-VMEM compiler limit


def _fit_blocks(s_q, s_kv, d, itemsize, block_q, block_kv):
    """Shrink (block_q, block_kv) until the kernels' VMEM residency fits the
    scoped budget. Per-program residency (matches the compiler's scoped-vmem
    accounting): up to three streamed [block_q, d] blocks and two resident
    [max(s_q,s_kv), d] arrays (K/V forward; Q/dO in the dkv backward), each
    double-buffered across grid steps in the input dtype, plus fp32
    temporaries (score tile, K/V tile casts, q cast + accumulators). Found
    the hard way: the KL-VAE's 32×32 single-head attention (S=1024, d=512,
    fp32) exceeded the 16 MB limit by 1.06 MB at the default 512 blocks.
    Returns None when no block size fits (huge s·d: the resident arrays
    alone exceed the budget) — callers fall back to the einsum path."""
    resident = 4 * _round_up(max(s_q, s_kv), 128) * d * itemsize
    while True:
        bq = min(block_q, _round_up(s_q, 8))
        bkv = min(block_kv, _round_up(s_kv, 128))
        est = (resident
               + 6 * bq * d * itemsize   # streamed blocks, double-buffered
               + bq * bkv * 4            # score tile (fp32)
               + 2 * bkv * d * 4         # K/V tile casts (fp32)
               + 3 * bq * d * 4)         # q cast + accumulators (fp32)
        if est <= _VMEM_BUDGET:
            return bq, bkv
        if block_q > 128:
            block_q //= 2
        elif block_kv > 128:
            block_kv //= 2
        else:
            return None


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, kv_len,
                      block_kv):
    """One (batch·head, q-block) program. Online softmax over KV tiles."""
    q = q_ref[0].astype(jnp.float32) * scale  # [BQ, D]
    bq = q.shape[0]
    kv_padded = k_ref.shape[1]
    num_kv = kv_padded // block_kv

    def body(i, carry):
        acc, m_i, l_i = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BKV]
        # mask out padded kv positions
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
        s = jnp.where(kv_ids + i * block_kv < kv_len, s, _NEG_INF)

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kv, body, (acc0, m0, l0))

    l_safe = jnp.maximum(l_i, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_safe)  # [BQ, 1]


def _flash_forward(q, k, v, scale, block_q, block_kv, interpret):
    """q,k,v: [BH, S, D] fp32/bf16. Returns (out [BH,S,D], lse [BH,S])."""
    bh, s_q, d = q.shape
    s_kv = k.shape[1]

    block_q = min(block_q, _round_up(s_q, 8))
    block_kv = min(block_kv, _round_up(s_kv, 128))
    q_pad = _round_up(s_q, block_q)
    kv_pad = _round_up(s_kv, block_kv)

    if q_pad != s_q:
        q = jnp.pad(q, ((0, 0), (0, q_pad - s_q), (0, 0)))
    if kv_pad != s_kv:
        k = jnp.pad(k, ((0, 0), (0, kv_pad - s_kv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, kv_pad - s_kv), (0, 0)))

    grid = (bh, q_pad // block_q)
    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, kv_len=s_kv, block_kv=block_kv
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * q_pad * kv_pad * d,
            bytes_accessed=(2 * bh * q_pad * d + 2 * bh * kv_pad * d)
            * q.dtype.itemsize,
            transcendentals=bh * q_pad * kv_pad,
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :s_q], lse[:, :s_q, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_attention_bhsd(q, k, v, scale, block_q, block_kv, interpret):
    out, _ = _flash_forward(q, k, v, scale, block_q, block_kv, interpret)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_kv, interpret):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_kv, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, scale, kv_len, block_kv):
    """Per (batch·head, q-block): dq = scale · Σ_j [P∘(dP−δ)]·K_j, streaming
    KV tiles with P recomputed from the saved lse (never materialized)."""
    q = q_ref[0].astype(jnp.float32) * scale
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # [BQ, 1]
    delta = delta_ref[0]  # [BQ, 1]
    bq = q.shape[0]
    num_kv = k_ref.shape[1] // block_kv

    def body(j, acc):
        k = k_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        kv_ids = jax.lax.broadcasted_iota(jnp.int32, (bq, block_kv), 1)
        s = jnp.where(kv_ids + j * block_kv < kv_len, s, _NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, num_kv, body, jnp.zeros((bq, q_ref.shape[-1]), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale, q_len, block_q):
    """Per (batch·head, kv-block): dv = Σ_i Pᵀ·dO_i, dk = scale·Σ_i
    [P∘(dP−δ)]ᵀ·q_i, streaming Q tiles."""
    k = k_ref[0].astype(jnp.float32)  # [BKV, D]
    v = v_ref[0].astype(jnp.float32)
    bkv = k.shape[0]
    num_q = q_ref.shape[1] // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        qs = q * scale
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # mask padded q rows: lse is 0 there; exp(-inf) handles kv padding in
        # fwd but q padding needs explicit zeroing of p rows
        q_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, bkv), 0)
        valid = (q_ids + i * block_q) < q_len
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    zeros = jnp.zeros((bkv, k_ref.shape[-1]), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_q, body, (zeros, zeros))
    dk_ref[0] = dk_acc.astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale, block_q, block_kv,
                    interpret):
    """Pallas backward over [BH, S, D] operands."""
    bh, s_q, d = q.shape
    s_kv = k.shape[1]

    block_q = min(block_q, _round_up(s_q, 8))
    block_kv = min(block_kv, _round_up(s_kv, 128))
    q_pad = _round_up(s_q, max(block_q, 128))
    kv_pad = _round_up(s_kv, block_kv)
    block_q = min(block_q, q_pad)

    pad_q = lambda t: jnp.pad(t, ((0, 0), (0, q_pad - s_q), (0, 0))) \
        if q_pad != s_q else t
    pad_kv = lambda t: jnp.pad(t, ((0, 0), (0, kv_pad - s_kv), (0, 0))) \
        if kv_pad != s_kv else t

    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [BH, S, 1]
    qp, dop = pad_q(q), pad_q(g)
    lsep = pad_q(lse[:, :, None])
    deltap = pad_q(delta)
    kp, vp = pad_kv(k), pad_kv(v)

    vmem = pltpu.VMEM
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_len=s_kv,
                          block_kv=block_kv),
        grid=(bh, q_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, kv_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, block_q, 1), lambda b, i: (b, i, 0),
                         memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((bh, q_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, q_len=s_q,
                          block_q=min(block_q, q_pad)),
        grid=(bh, kv_pad // block_kv),
        in_specs=[
            pl.BlockSpec((1, q_pad, d), lambda b, j: (b, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, block_kv, d), lambda b, j: (b, j, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, block_kv, d), lambda b, j: (b, j, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, q_pad, d), lambda b, j: (b, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, q_pad, 1), lambda b, j: (b, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, q_pad, 1), lambda b, j: (b, 0, 0),
                         memory_space=vmem),
        ],
        out_specs=[
            pl.BlockSpec((1, block_kv, d), lambda b, j: (b, j, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, block_kv, d), lambda b, j: (b, j, 0),
                         memory_space=vmem),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, kv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, kv_pad, d), v.dtype),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :s_q], dk[:, :s_kv], dv[:, :s_kv]


def _flash_bwd_rule(scale, block_q, block_kv, interpret, res, g):
    """Flash backward as two Pallas kernels (dq; dk+dv), recomputing P from
    the saved lse — the S×S score matrix never touches HBM."""
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, scale, block_q, block_kv,
                           interpret)


_flash_attention_bhsd.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q, k, v,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: bool = False,
):
    """Fused flash attention. [B, S, H, D] layout, differentiable."""
    b, s_q, h, d = q.shape
    s_kv = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    fitted = _fit_blocks(s_q, s_kv, d, q.dtype.itemsize, block_q, block_kv)
    if fitted is None:
        # resident arrays alone exceed scoped VMEM — einsum handles it
        return sdpa_reference(q, k, v, scale)
    block_q, block_kv = fitted

    to_bhsd = lambda t, s: jnp.transpose(t, (0, 2, 1, 3)).reshape(b * h, s, d)
    qf = to_bhsd(q, s_q)
    kf = to_bhsd(k, s_kv)
    vf = to_bhsd(v, s_kv)

    out = _flash_attention_bhsd(qf, kf, vf, scale, block_q, block_kv,
                                interpret)
    return jnp.transpose(out.reshape(b, h, s_q, d), (0, 2, 1, 3))


_FLASH_MIN_SEQ = 1024
_FLASH_MAX_HEAD_DIM = 256


def sdpa(q, k, v, scale: float | None = None, use_flash: str | bool = "auto"):
    """Attention dispatcher (the `Attend`-equivalent surface).

    use_flash: True | False | "auto" — auto uses the Pallas kernel on TPU
    backends when the sequence is long enough to amortize it, and the XLA
    einsum elsewhere. Flash attention's win is avoiding the O(S²) score
    materialization; below ~1k tokens that matrix fits in VMEM anyway and
    the kernel's fixed costs dominate — profiling the 16×16-latent CFG
    U-Net (S=256) showed the Pallas calls eating ~1/3 of the forward, and
    switching small sequences to einsum cut the whole forward 3.17→2.82 ms
    and DDIM-150 sampling 34.5→38.7 samples/s (+12%, measured on TPU v5e).
    At S=4096 the kernel is 2.4× FASTER than einsum
    (BASELINE.md), hence the size dispatch rather than a global choice.
    """
    if use_flash == "auto":
        # head-dim cap: flash's win is avoiding the O(S²) score round-trip;
        # at d≥512 (the autoencoders' single-head 32×32 attention) the work
        # is d-dominated, the scores are comparatively small, and the
        # resident K/V push the kernel against the scoped-VMEM limit
        use_flash = (jax.default_backend() == "tpu"
                     and max(q.shape[1], k.shape[1]) >= _FLASH_MIN_SEQ
                     and q.shape[-1] <= _FLASH_MAX_HEAD_DIM)
    if not use_flash:
        return sdpa_reference(q, k, v, scale)
    return flash_attention(q, k, v, scale)
