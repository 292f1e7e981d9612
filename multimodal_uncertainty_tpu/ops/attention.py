"""Scaled-dot-product attention: XLA path + fused Pallas TPU kernel.

The fusion-transformer attention is the hot op named in the project's north
star. Sequences in this workload are short (<=512 tokens: ~197 FLAVA image
patches + <=512 text tokens, reference ``train.py:87``), so rather than a
streaming flash-attention we use a *whole-sequence* fused kernel: one grid
step per (batch, head-group) keeps Q, K, V and the S x S score matrix in
VMEM, computing QK^T -> mask -> softmax -> PV in a single pass with no HBM
round trips for the intermediates. The backward pass is a fused Pallas
kernel too (custom VJP, ``_attention_bwd_kernel`` below): it recomputes the
probabilities in VMEM and emits dQ/dK/dV in one pass.

All logits/softmax math runs in fp32 regardless of input dtype (parity with
the reference's fp16-safe LayerNorm philosophy, ``src/model.py:174-180``):
matmuls ACCUMULATE in fp32 (``preferred_element_type``) while their MXU
operands stay in the input dtype — on bf16 training paths that is 8x the
f32 MXU rate on v5e, and numerically identical to what the XLA einsum path
does with bf16 inputs. Softmax and the dS recurrence are computed in fp32;
p/dS feed the MXU in the input dtype (standard bf16 flash-attention).

Masking contract: ``key_mask`` is boolean (B, S), True = token is attendable.
Masked keys receive -1e30 before softmax — numerically identical to the
reference *physically removing* the tokens (their post-softmax weight is
exactly 0.0 in fp32), which is how the robustness sweeps implement
modality-ablation without dynamic shapes.
"""
from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

NEG_INF = -1e30


def _mask_bias(key_mask: jax.Array) -> jax.Array:
    return jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)


def sdpa_xla(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference XLA attention. q, k, v: (B, H, S, Dh); key_mask: (B, S)."""
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        scores = scores + _mask_bias(key_mask)[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def attention_probs_dropout(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    *,
    n_head: int,
    rate: float,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Attention with dropout on the attention PROBABILITIES — the torch
    BERT training regularizer (reference ``src/mmbt.py:86-234`` runs
    ``pytorch_pretrained_bert``'s BertModel, attention_probs_dropout_prob
    0.1). The fused kernels deliberately omit it to keep attention one
    Pallas call (DEVIATIONS.md); this heads-packed (B, S, D) XLA path is
    the opt-in exact-parity TRAINING mode so real-data parity runs can
    reproduce the reference regime. ``rate=0`` reproduces
    :func:`sdpa_xla` exactly (eval is always kernel-eligible: dropout is
    train-only)."""
    b, s, d = q.shape
    assert d % n_head == 0, (d, n_head)
    dh = d // n_head

    def heads(t):
        return t.reshape(b, s, n_head, dh).transpose(0, 2, 1, 3)

    scale = 1.0 / jnp.sqrt(jnp.asarray(dh, jnp.float32))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", heads(q), heads(k),
        preferred_element_type=jnp.float32,
    ) * scale
    if key_mask is not None:
        scores = scores + _mask_bias(key_mask)[:, None, None, :]
    probs = jax.nn.softmax(scores, axis=-1)
    if rate > 0.0:
        if rng is None:
            raise ValueError("attention_probs_dropout: rate > 0 needs rng")
        keep = jax.random.bernoulli(rng, 1.0 - rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), heads(v),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # blocks carry G heads: (1, G, S, Dh). MXU operands stay in the input
    # dtype (bf16 on the training path — 8x the f32 MXU rate on v5e) with
    # fp32 ACCUMULATION via preferred_element_type; softmax math is fp32.
    # This matches the XLA path exactly (sdpa_xla's einsum on bf16 inputs).
    q = q_ref[0]  # (G, S, Dh), native dtype
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, S, S) fp32
    mask = mask_ref[0]  # (1, S) int32 keep flags -> broadcast over G, queries
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, S, Dh)
    o_ref[0] = out.astype(o_ref.dtype)


def _heads_per_block(h: int, s: int, dh: int) -> int:
    """Largest divisor of h whose per-step VMEM footprint stays ~<=8MB:
    scores (G, S, S) fp32 + 4x (G, S, Dh) fp32."""
    budget = 8 * 1024 * 1024
    best = 1
    for g in range(1, h + 1):
        if h % g:
            continue
        need = 4 * g * s * s + 4 * 4 * g * s * dh
        if need <= budget:
            best = g
    return best


def _sdpa_pallas_fwd_impl(q, k, v, mask_i32, *, interpret: bool):
    b, h, s, dh = q.shape
    scale = 1.0 / (dh**0.5)
    g = _heads_per_block(h, s, dh)
    kernel = functools.partial(_attn_kernel, scale=scale)
    grid = (b, h // g)
    blk = lambda bi, hi: (bi, hi, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, g, s, dh), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, s, dh), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g, s, dh), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, s, dh), blk, memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 3,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, mask_i32)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _sdpa_pallas(q, k, v, mask_i32, interpret):
    return _sdpa_pallas_fwd_impl(q, k, v, mask_i32, interpret=interpret)


def _sdpa_pallas_fwd(q, k, v, mask_i32, interpret):
    out = _sdpa_pallas_fwd_impl(q, k, v, mask_i32, interpret=interpret)
    return out, (q, k, v, mask_i32)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, *, scale: float):
    """Fused backward: recompute p in VMEM, then dv/ds/dq/dk without any
    HBM-resident (S, S) intermediates. Softmax/ds math is fp32; MXU operands
    (incl. p and ds) run in the input dtype with fp32 accumulation — the
    standard bf16-flash-attention recipe (all surrounding projection grads
    already flow through bf16 matmuls)."""
    q = q_ref[0]  # (G, S, Dh), native dtype
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    bq = (((2,), (2,)), ((0,), (0,)))  # contract last dims, batch head axis
    scores = jax.lax.dot_general(q, k, bq, preferred_element_type=jnp.float32)
    scores = scores * scale
    mask = mask_ref[0]
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (G, Sq, Sk) fp32
    p_lp = p.astype(q.dtype)

    # dv = p^T g : contract the query axis
    dv = jax.lax.dot_general(
        p_lp, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dp = g v^T
    dp = jax.lax.dot_general(
        g, v, bq, preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds_lp = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        ds_lp, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds_lp, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_heads_per_block(h: int, s: int, dh: int) -> int:
    """4 (G,S,S) fp32 buffers + 7 (G,S,Dh) fp32 buffers under ~10MB."""
    budget = 10 * 1024 * 1024
    best = 1
    for g in range(1, h + 1):
        if h % g:
            continue
        need = 4 * 4 * g * s * s + 4 * 7 * g * s * dh
        if need <= budget:
            best = g
    return best


def _sdpa_bwd_impl(q, k, v, mask_i32, grad, interpret):
    b, h, s, dh = q.shape
    scale = 1.0 / (dh**0.5)
    g_heads = _bwd_heads_per_block(h, s, dh)
    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    grid = (b, h // g_heads)
    blk = lambda bi, hi: (bi, hi, 0, 0)  # noqa: E731
    spec = pl.BlockSpec((1, g_heads, s, dh), blk, memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec((1, 1, s), lambda bi, hi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            spec,
        ],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * h * s * s * dh,
            bytes_accessed=4 * b * h * s * dh * 7,
            transcendentals=b * h * s * s,
        ),
    )(q, k, v, mask_i32, grad)
    return dq, dk, dv


def _sdpa_pallas_bwd(interpret, res, grad):
    q, k, v, mask_i32 = res
    dq, dk, dv = _sdpa_bwd_impl(q, k, v, mask_i32, grad, interpret)
    return dq, dk, dv, None


_sdpa_pallas.defvjp(_sdpa_pallas_fwd, _sdpa_pallas_bwd)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Heads-last fused kernel: (B, S, D) in, (B, S, D) out.
#
# The (B, H, S, Dh) interface above forces XLA to relayout each of Q/K/V
# (and their gradients) between the projection matmuls' natural (B, S, D)
# layout and the kernel's heads-first layout — measured at ~15% of the
# flagship train step (57 HBM copies of bf16[256,274,768]-class tensors,
# docs/study round-2 profile) and ~8% of the full-size MMBT step (the
# bf16[64,165,12,64] copy group). This variant keeps HBM tensors in
# (B, S, D) and splits heads INSIDE the kernel.
#
# Mosaic constrains a block's last dim to a multiple of 128 lanes (or the
# full array dim), so the per-head block is:
#   * Dh % 128 == 0  ->  one head per (1, S, Dh) block; the block IS the
#     per-head matrix, no reshape/transpose anywhere (fusion model, Dh=256).
#   * 128 % Dh == 0  ->  g = 128//Dh heads share one (1, S, 128) block
#     (BERT/MMBT/ViLT, Dh=64 -> g=2). Each sub-head's attention uses
#     LANE-MASKED matmuls on the 128-wide block: (q*m_j)(k*m_j)^T contracts
#     only head j's lanes, and p_j(v*m_j) writes only head j's lanes, so
#     the accumulated output needs no in-kernel relayout either. The masked
#     K=128 contraction costs the same MXU cycles a K=Dh contraction would
#     (sub-128 contractions are padded on the MXU), i.e. the trick is
#     FLOP-free; the masks are VPU constants.
# ---------------------------------------------------------------------------


def _hl_block_width(dh: int):
    """Last-dim block width for the heads-last kernels, or None when the
    head dim fits neither Mosaic-blockable pattern (e.g. Dh=96)."""
    if dh % 128 == 0:
        return dh
    if 128 % dh == 0:
        return 128
    return None


def _lane_masks(bw: int, dh: int, dtype):
    """(1, bw) lane masks selecting each of the bw//dh sub-heads (0/1 is
    exact in any dtype; masks stay in the operand dtype so the masked
    multiply does not promote the MXU operands to fp32)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)
    return [(lane // dh == j).astype(dtype) for j in range(bw // dh)]


def _attn_kernel_hl(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, dh):
    # blocks are (BB, S, BW) slices of (B, S, D); BW carries bw//dh heads
    # and BB batch items ride one grid step (fewer, larger DMAs — the fwd
    # kernel is HBM-pipeline-bound at BB=1, measured ~50% of peak).
    # MXU operands stay in the input dtype, fp32 accumulation + softmax
    # (see _attn_kernel).
    q = q_ref[...]  # (BB, S, BW), native dtype
    k = k_ref[...]
    v = v_ref[...]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)  # (BB, 1, S)
    bw = q.shape[-1]
    bq = (((2,), (2,)), ((0,), (0,)))  # contract lanes, batch dim 0

    def one_head(qj, kj, vj):
        scores = jax.lax.dot_general(
            qj, kj, bq, preferred_element_type=jnp.float32
        ) * scale  # (BB, S, S) fp32
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return jax.lax.dot_general(
            p.astype(vj.dtype), vj, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BB, S, BW) — nonzero only in vj's live lanes

    if bw == dh:
        out = one_head(q, k, v)
    else:
        out = jnp.zeros(q.shape, jnp.float32)
        for mj in _lane_masks(bw, dh, q.dtype):
            out = out + one_head(q * mj, k * mj, v * mj)
    o_ref[...] = out.astype(o_ref.dtype)


def _hl_batch_block(b, s, bw, itemsize, n_bufs, n_scores, n_acc_f32=0):
    """Batch items per grid step: largest of {1,2,4,8} dividing b whose
    VMEM footprint (double-buffered operand blocks + fp32 score planes +
    single-buffered fp32 accumulators/temporaries of the lane-masked
    sub-head loop, ``n_acc_f32``) stays within ~12MB."""
    budget = 12 * 1024 * 1024
    best = 1
    for bb in (2, 4, 8):
        if b % bb:
            continue
        need = (
            n_bufs * bb * s * bw * itemsize * 2
            + n_scores * bb * s * s * 4
            + n_acc_f32 * bb * s * bw * 4
        )
        if need <= budget:
            best = bb
    return best


def _n_acc_f32(bw, dh, n_grad):
    """fp32 (BB, S, BW) buffers live inside the lane-masked sub-head loop
    (Dh < 128): the running accumulators plus one_head's return temporaries.
    Zero when the block IS one head (no loop, output written once)."""
    return 0 if bw == dh else 2 * n_grad


def _hl_specs(s, bw, bb):
    blk = lambda bi, gi: (bi, 0, gi)  # noqa: E731
    spec = pl.BlockSpec((bb, s, bw), blk, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (bb, 1, s), lambda bi, gi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    return spec, mask_spec


def _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_head, interpret):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    bb = _hl_batch_block(
        b, s, bw, q.dtype.itemsize, 4, max(1, bw // dh), _n_acc_f32(bw, dh, 1)
    )
    spec, mask_spec = _hl_specs(s, bw, bb)
    kernel = functools.partial(_attn_kernel_hl, scale=1.0 / (dh**0.5), dh=dh)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b // bb, d // bw),
        in_specs=[spec, spec, spec, mask_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * 3,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32)


def _attn_bwd_kernel_hl(q_ref, k_ref, v_ref, mask_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, *, scale, dh):
    # Native-dtype MXU operands (incl. p, ds), fp32 accumulation + softmax
    # (see _attn_bwd_kernel). Blocks are (BB, S, BW).
    q = q_ref[...]  # (BB, S, BW), native dtype
    k = k_ref[...]
    v = v_ref[...]
    go = g_ref[...]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)  # (BB, 1, S)
    bw = q.shape[-1]
    bq = (((2,), (2,)), ((0,), (0,)))  # contract lanes, batch dim 0
    ct_q = (((1,), (1,)), ((0,), (0,)))  # contract the query axis

    def one_head(qj, kj, vj, goj):
        scores = jax.lax.dot_general(
            qj, kj, bq, preferred_element_type=jnp.float32
        ) * scale
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (BB, Sq, Sk) fp32
        p_lp = p.astype(qj.dtype)
        dv = jax.lax.dot_general(
            p_lp, goj, ct_q, preferred_element_type=jnp.float32
        )  # p^T go : (BB, Sk, BW), live lanes = goj's
        dp = jax.lax.dot_general(goj, vj, bq, preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lp = ds.astype(qj.dtype)
        dq = jax.lax.dot_general(
            ds_lp, kj, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # live lanes = kj's
        dk = jax.lax.dot_general(
            ds_lp, qj, ct_q, preferred_element_type=jnp.float32
        ) * scale
        return dq, dk, dv

    if bw == dh:
        dq, dk, dv = one_head(q, k, v, go)
    else:
        dq = jnp.zeros(q.shape, jnp.float32)
        dk = jnp.zeros_like(dq)
        dv = jnp.zeros_like(dq)
        for mj in _lane_masks(bw, dh, q.dtype):
            dqj, dkj, dvj = one_head(q * mj, k * mj, v * mj, go * mj)
            dq, dk, dv = dq + dqj, dk + dkj, dv + dvj
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sdpa_pallas_hl(q, k, v, mask_i32, n_head, interpret):
    return _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_head, interpret)


def _sdpa_pallas_hl_fwd(q, k, v, mask_i32, n_head, interpret):
    out = _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_head, interpret)
    return out, (q, k, v, mask_i32)


def _sdpa_hl_bwd_impl(q, k, v, mask_i32, grad, n_head, interpret):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    bb = _hl_batch_block(
        b, s, bw, q.dtype.itemsize, 8, 4 * max(1, bw // dh),
        _n_acc_f32(bw, dh, 3),
    )
    spec, mask_spec = _hl_specs(s, bw, bb)
    kernel = functools.partial(
        _attn_bwd_kernel_hl, scale=1.0 / (dh**0.5), dh=dh
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b // bb, d // bw),
        in_specs=[spec, spec, spec, mask_spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * 7,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, grad)
    return dq, dk, dv


def _sdpa_pallas_hl_bwd(n_head, interpret, res, grad):
    q, k, v, mask_i32 = res
    dq, dk, dv = _sdpa_hl_bwd_impl(q, k, v, mask_i32, grad, n_head, interpret)
    return dq, dk, dv, None


_sdpa_pallas_hl.defvjp(_sdpa_pallas_hl_fwd, _sdpa_pallas_hl_bwd)


# ---------------------------------------------------------------------------
# Heads-last kernels WITH attention-probs dropout (VERDICT r4 #9).
#
# The parity training regime (--attention_probs_dropout 0.1, torch BERT's
# regularizer) previously had to leave the kernel path entirely for the
# XLA (B,H,S,S)-materializing route. This variant is the "fused mask pass":
# the keep mask is drawn OUTSIDE the kernel with the model's dropout rng —
# jax.random.bernoulli(rng, 1-rate, (B,H,S,S)), bit-identical to the mask
# the XLA path draws from the same key — and consumed inside the kernel as
# a uint8 side input (bb*g*S*S bytes of VMEM; ~1-2% extra HBM traffic on
# the full-size MMBT step vs the XLA path's multiple fp32 (B,H,S,S)
# materializations). Because the mask is an explicit input, forward and
# backward see the SAME draw with no in-kernel PRNG reseeding subtleties
# (pltpu.prng_* additionally has no CPU interpret lowering to test
# against).
# ---------------------------------------------------------------------------


def _attn_kernel_hl_drop(q_ref, k_ref, v_ref, mask_ref, keep_ref, o_ref, *,
                         scale, dh, inv_keep):
    q = q_ref[...]  # (BB, S, BW), native dtype
    k = k_ref[...]
    v = v_ref[...]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)  # (BB, 1, S)
    bw = q.shape[-1]
    bq = (((2,), (2,)), ((0,), (0,)))

    def one_head(qj, kj, vj, j):
        scores = jax.lax.dot_general(
            qj, kj, bq, preferred_element_type=jnp.float32
        ) * scale
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pd = jnp.where(keep_ref[:, j] != 0, p * inv_keep, 0.0)
        return jax.lax.dot_general(
            pd.astype(vj.dtype), vj, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    if bw == dh:
        out = one_head(q, k, v, 0)
    else:
        out = jnp.zeros(q.shape, jnp.float32)
        for j, mj in enumerate(_lane_masks(bw, dh, q.dtype)):
            out = out + one_head(q * mj, k * mj, v * mj, j)
    o_ref[...] = out.astype(o_ref.dtype)


def _attn_bwd_kernel_hl_drop(q_ref, k_ref, v_ref, mask_ref, keep_ref, g_ref,
                             dq_ref, dk_ref, dv_ref, *, scale, dh, inv_keep):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    go = g_ref[...]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)
    bw = q.shape[-1]
    bq = (((2,), (2,)), ((0,), (0,)))
    ct_q = (((1,), (1,)), ((0,), (0,)))

    def one_head(qj, kj, vj, goj, j):
        scores = jax.lax.dot_general(
            qj, kj, bq, preferred_element_type=jnp.float32
        ) * scale
        scores = scores + bias
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        keep = keep_ref[:, j] != 0
        pd = jnp.where(keep, p * inv_keep, 0.0)  # dropped probs (fwd's)
        dv = jax.lax.dot_general(
            pd.astype(qj.dtype), goj, ct_q, preferred_element_type=jnp.float32
        )
        dpd = jax.lax.dot_general(
            goj, vj, bq, preferred_element_type=jnp.float32
        )
        dp = jnp.where(keep, dpd * inv_keep, 0.0)  # chain through dropout
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds_lp = ds.astype(qj.dtype)
        dq = jax.lax.dot_general(
            ds_lp, kj, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        dk = jax.lax.dot_general(
            ds_lp, qj, ct_q, preferred_element_type=jnp.float32
        ) * scale
        return dq, dk, dv

    if bw == dh:
        dq, dk, dv = one_head(q, k, v, go, 0)
    else:
        dq = jnp.zeros(q.shape, jnp.float32)
        dk = jnp.zeros_like(dq)
        dv = jnp.zeros_like(dq)
        for j, mj in enumerate(_lane_masks(bw, dh, q.dtype)):
            dqj, dkj, dvj = one_head(q * mj, k * mj, v * mj, go * mj, j)
            dq, dk, dv = dq + dqj, dk + dkj, dv + dvj
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _hl_drop_specs(s, bw, bb, g):
    spec, mask_spec = _hl_specs(s, bw, bb)
    keep_spec = pl.BlockSpec(
        (bb, g, s, s), lambda bi, gi: (bi, gi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return spec, mask_spec, keep_spec


def _hl_drop_batch_block(b, s, bw, dh, itemsize, n_bufs, n_scores, n_grad):
    """bb for the dropout kernels: the plain-hl budget plus the
    double-buffered (bb, g, s, s) uint8 keep block."""
    g = max(1, bw // dh)
    budget = 12 * 1024 * 1024
    best = 1
    for bb in (2, 4, 8):
        if b % bb:
            continue
        need = (
            n_bufs * bb * s * bw * itemsize * 2
            + n_scores * bb * s * s * 4
            + _n_acc_f32(bw, dh, n_grad) * bb * s * bw * 4
            + bb * g * s * s * 2  # keep block, double-buffered uint8
        )
        if need <= budget:
            best = bb
    return best


def _sdpa_hl_drop_fwd_impl(q, k, v, mask_i32, keep_u8, n_head, rate,
                           interpret):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    g = max(1, bw // dh)
    bb = _hl_drop_batch_block(b, s, bw, dh, q.dtype.itemsize, 4, g, 1)
    spec, mask_spec, keep_spec = _hl_drop_specs(s, bw, bb, g)
    kernel = functools.partial(
        _attn_kernel_hl_drop, scale=1.0 / (dh**0.5), dh=dh,
        inv_keep=1.0 / (1.0 - rate),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b // bb, d // bw),
        in_specs=[spec, spec, spec, mask_spec, keep_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * 3 + b * n_head * s * s,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, keep_u8)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _sdpa_pallas_hl_drop(q, k, v, mask_i32, keep_u8, n_head, rate, interpret):
    return _sdpa_hl_drop_fwd_impl(q, k, v, mask_i32, keep_u8, n_head, rate,
                                  interpret)


def _sdpa_pallas_hl_drop_fwd(q, k, v, mask_i32, keep_u8, n_head, rate,
                             interpret):
    out = _sdpa_hl_drop_fwd_impl(q, k, v, mask_i32, keep_u8, n_head, rate,
                                 interpret)
    return out, (q, k, v, mask_i32, keep_u8)


def _sdpa_pallas_hl_drop_bwd(n_head, rate, interpret, res, grad):
    q, k, v, mask_i32, keep_u8 = res
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    g = max(1, bw // dh)
    bb = _hl_drop_batch_block(b, s, bw, dh, q.dtype.itemsize, 8, 4 * g, 3)
    spec, mask_spec, keep_spec = _hl_drop_specs(s, bw, bb, g)
    kernel = functools.partial(
        _attn_bwd_kernel_hl_drop, scale=1.0 / (dh**0.5), dh=dh,
        inv_keep=1.0 / (1.0 - rate),
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b // bb, d // bw),
        in_specs=[spec, spec, spec, mask_spec, keep_spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * 7 + b * n_head * s * s,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, keep_u8, grad)
    return dq, dk, dv, None, None


_sdpa_pallas_hl_drop.defvjp(_sdpa_pallas_hl_drop_fwd, _sdpa_pallas_hl_drop_bwd)


def _hl_drop_whole_seq_fits(b, s, bw, dh, itemsize) -> bool:
    """bb=1 VMEM feasibility for the dropout backward (the worst pass)."""
    g = max(1, bw // dh)
    need = (
        8 * s * bw * itemsize * 2
        + 4 * g * s * s * 4
        + _n_acc_f32(bw, dh, 3) * s * bw * 4
        + g * s * s * 2
    )
    return need <= _WHOLE_SEQ_VMEM_CAP


def _packed_specs(s, d, bw, bb):
    # q/k/v are views of the SAME packed (B, S, 3D) operand at different
    # last-dim block offsets — no slice materialization in HBM
    ng = d // bw
    q_spec = pl.BlockSpec((bb, s, bw), lambda bi, gi: (bi, 0, gi),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((bb, s, bw), lambda bi, gi: (bi, 0, ng + gi),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((bb, s, bw), lambda bi, gi: (bi, 0, 2 * ng + gi),
                          memory_space=pltpu.VMEM)
    return q_spec, k_spec, v_spec


def _sdpa_packed_fwd_impl(qkv, mask_i32, n_head, interpret):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    bw = _hl_block_width(dh)
    bb = _hl_batch_block(
        b, s, bw, qkv.dtype.itemsize, 4, max(1, bw // dh), _n_acc_f32(bw, dh, 1)
    )
    spec, mask_spec = _hl_specs(s, bw, bb)
    q_spec, k_spec, v_spec = _packed_specs(s, d, bw, bb)
    kernel = functools.partial(_attn_kernel_hl, scale=1.0 / (dh**0.5), dh=dh)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        grid=(b // bb, d // bw),
        in_specs=[q_spec, k_spec, v_spec, mask_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * 3,
            transcendentals=b * n_head * s * s,
        ),
    )(qkv, qkv, qkv, mask_i32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _sdpa_pallas_packed(qkv, mask_i32, n_head, interpret):
    return _sdpa_packed_fwd_impl(qkv, mask_i32, n_head, interpret)


def _sdpa_pallas_packed_fwd(qkv, mask_i32, n_head, interpret):
    out = _sdpa_packed_fwd_impl(qkv, mask_i32, n_head, interpret)
    return out, (qkv, mask_i32)


def _sdpa_packed_bwd_impl(qkv, mask_i32, grad, n_head, interpret):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    bw = _hl_block_width(dh)
    bb = _hl_batch_block(
        b, s, bw, qkv.dtype.itemsize, 8, 4 * max(1, bw // dh),
        _n_acc_f32(bw, dh, 3),
    )
    spec, mask_spec = _hl_specs(s, bw, bb)
    q_spec, k_spec, v_spec = _packed_specs(s, d, bw, bb)
    kernel = functools.partial(
        _attn_bwd_kernel_hl, scale=1.0 / (dh**0.5), dh=dh
    )
    part = jax.ShapeDtypeStruct((b, s, d), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(part, part, part),
        grid=(b // bb, d // bw),
        in_specs=[q_spec, k_spec, v_spec, mask_spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * s * s * d,
            bytes_accessed=4 * b * s * d * 7,
            transcendentals=b * n_head * s * s,
        ),
    )(qkv, qkv, qkv, mask_i32, grad)
    return jnp.concatenate([dq, dk, dv], axis=-1)


def _sdpa_pallas_packed_bwd(n_head, interpret, res, grad):
    qkv, mask_i32 = res
    return _sdpa_packed_bwd_impl(qkv, mask_i32, grad, n_head, interpret), None


_sdpa_pallas_packed.defvjp(_sdpa_pallas_packed_fwd, _sdpa_pallas_packed_bwd)


# ---------------------------------------------------------------------------
# Flash (sequence-blocked) kernels: long-context coverage.
#
# The whole-sequence kernels above keep the full (S, S) score plane of a
# head in VMEM — the right call at the reference's S <= 512 (SURVEY §5:
# sequences are short), but impossible past S ~ 1k: the score plane alone
# is 16 MB fp32 at S = 2048, 67 MB at S = 4096, and the XLA fallback
# materializes B·H·S² in HBM (25 GB for a 12-head batch-8 model at S=8192).
# These kernels instead stream K/V in KC-wide chunks with the online-softmax
# recurrence (running row max m, denominator l, output accumulator), so VMEM
# holds only a (BQ, KC) score tile — the SURVEY §5 "blockwise attention"
# long-context stretch goal.
#
# Layout follows the heads-last family: (B, S, D) operands, one (or, via
# the lane-masked sub-head trick, 128//Dh) heads per 128-lane block, grid
# (batch, head-group, q-block) with q innermost so the full-sequence K/V
# blocks stay VMEM-resident across q steps. The forward emits, alongside
# the output, the per-row log-sum-exp L = m + log l in a lane-broadcast
# (B, S, 128·n_groups) fp32 tensor (sub-head j's L occupies its own Dh
# lanes — extraction in the backward is a masked lane-mean, no transposes).
# The backward recomputes probabilities p = exp(s - L) chunkwise in two
# passes: dQ on the q-block grid, dK/dV on a k-block grid, with
# delta = rowsum(dO ∘ O) precomputed in XLA (it fuses into surrounding
# elementwise ops). Same dtype strategy as every kernel here: MXU operands
# in the input dtype, fp32 accumulation and softmax math.
#
# Envelope: the resident kernels keep one side full-S in VMEM (fwd/dq: K,V;
# dK/dV: Q/dO/L/delta), which caps S at ~4k (bf16, Dh<=128) on a 16 MB-VMEM
# core; past that the impls fall through to the STREAMING kernels (next
# section) which hold only per-chunk blocks — S is then unbounded at the
# flash-standard cost of re-reading the q-side operands once per key chunk.
# Routing: the heads-last entry points
# auto-escalate to flash when the whole-seq VMEM budget fails, and pad S to
# a 128-multiple when needed (masked keys / sliced rows — exact, and the
# pad/slice VJP zeroes the padded rows' gradient contributions).
# ---------------------------------------------------------------------------


_WHOLE_SEQ_VMEM_CAP = 14 * 1024 * 1024  # test hook: lowered to force flash


def _hl_whole_seq_fits(b, s, bw, dh, itemsize) -> bool:
    """Whether the whole-sequence heads-last kernels' worst pass (the
    backward) fits VMEM at bb=1. ``_hl_batch_block`` answers "how many batch
    items", silently returning 1 even when bb=1 is already over budget —
    this is the companion predicate that catches that case."""
    need = (
        8 * s * bw * itemsize * 2
        + 4 * max(1, bw // dh) * s * s * 4
        + _n_acc_f32(bw, dh, 3) * s * bw * 4
    )
    return need <= _WHOLE_SEQ_VMEM_CAP


def _flash_tiles(s, bw, dh, itemsize):
    """(BQ, KC) tile sizes for the flash kernels, or None when S is not a
    128-multiple or the worst kernel (dK/dV: full-S q/grad/lse/delta
    resident) cannot fit VMEM. Prefers the largest tile area."""
    if s % 128 or s == 0:
        return None
    subhead = 2 if bw != dh else 1  # lane-masked loop doubles live temporaries
    budget = 12 * 1024 * 1024
    best = None
    for bq in (512, 256, 128):
        if s % bq:
            continue
        for kc in (512, 256, 128):
            if s % kc:
                continue
            need = (
                2 * s * bw * itemsize      # q, dO (constant-index blocks)
                + 2 * s * 128 * 4          # lse, delta
                + s * 4                    # mask
                + 4 * kc * bw * itemsize * 2   # k, v, dk, dv blocks (dbl-buf)
                + 3 * bq * kc * 4 * subhead    # score / p / ds tiles
                + 2 * kc * bw * 4 * subhead    # dk/dv fp32 accumulators
                + 2 * bq * bw * 4 * subhead    # fwd/dq fp32 accumulators
            )
            if need <= budget and (best is None or bq * kc > best[0] * best[1]):
                best = (bq, kc)
    return best


def _flash_stream_tiles(s, bw, dh, itemsize):
    """(BQ, KC) tile sizes for the STREAMING flash kernels (nothing
    full-sequence resident: q/dO/lse/delta blocks ride the grid's inner
    dimension like k/v do, and the online state lives in VMEM scratch), or
    None when S is not a 128-multiple. The budget covers only per-chunk
    double-buffered blocks + scratch, so any 128-multiple S fits — this is
    the unbounded-S fallback behind ``_flash_tiles``'s resident envelope.
    Re-read traffic scales as S/BQ for K/V (fwd, dq) and S/KC for the
    q-side operands (dK/dV), so prefer the largest BALANCED tile: max
    area, then max min-side."""
    if s % 128 or s == 0:
        return None
    subhead = 2 if bw != dh else 1
    budget = 12 * 1024 * 1024
    best = None
    for bq in (1024, 512, 256, 128):
        if s % bq:
            continue
        for kc in (1024, 512, 256, 128):
            if s % kc:
                continue
            blocks_dq = (
                3 * bq * bw * itemsize * 2     # q, dO, dq blocks (dbl-buf)
                + 2 * kc * bw * itemsize * 2   # k, v blocks
                + 2 * bq * 128 * 4 * 2         # lse, delta blocks
                + kc * 4 * 2                   # mask chunk
                + bq * bw * 4                  # dq fp32 accumulator (scratch)
                + 3 * bq * kc * 4 * subhead    # score / p / ds tiles
            )
            blocks_dkv = (
                2 * bq * bw * itemsize * 2     # q, dO blocks
                + 4 * kc * bw * itemsize * 2   # k, v, dk, dv blocks
                + 2 * bq * 128 * 4 * 2         # lse, delta blocks
                + kc * 4 * 2
                + 2 * kc * bw * 4              # dk/dv fp32 accumulators
                + 3 * bq * kc * 4 * subhead
            )
            need = max(blocks_dq, blocks_dkv)
            if need <= budget and (
                best is None
                or (bq * kc, min(bq, kc))
                > (best[0] * best[1], min(best))
            ):
                best = (bq, kc)
    return best


def _lane_masks128(dh: int):
    """fp32 (1, 1, 128) selectors of each sub-head's lane range in the
    lane-broadcast lse/delta layout (a single all-ones mask when Dh >= 128:
    the whole 128-lane plane belongs to one head)."""
    dc = min(dh, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
    return [(lane // dc == j).astype(jnp.float32) for j in range(128 // dc)]


def _pick_col(colblk, j, dh):
    """Extract sub-head j's per-row scalar from a lane-broadcast
    (BB, BQ, 128) block -> (BB, BQ, 1): masked lane-mean (each scalar is
    replicated across its Dh lanes, so sum/count is exact)."""
    dc = min(dh, 128)
    sel = _lane_masks128(dh)[j]
    return jnp.sum(colblk * sel, axis=-1, keepdims=True) / dc


def _attn_kernel_flash_fwd(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                           *, scale, dh, kc):
    q = q_ref[...]  # (BB, BQ, BW), native dtype
    bb, bq, bw = q.shape
    nk = k_ref.shape[1] // kc
    ct_lanes = (((2,), (2,)), ((0,), (0,)))  # contract lanes, batch dim 0
    ct_keys = (((2,), (1,)), ((0,), (0,)))   # contract the key-chunk axis

    def one_head(mj):
        qj = q if mj is None else q * mj

        def body(i, carry):
            m, l, acc = carry
            kb = k_ref[:, pl.ds(i * kc, kc), :]
            vb = v_ref[:, pl.ds(i * kc, kc), :]
            if mj is not None:
                kb = kb * mj
                vb = vb * mj
            bias = jnp.where(
                mask_ref[:, :, pl.ds(i * kc, kc)] > 0, 0.0, NEG_INF
            )  # (BB, 1, KC)
            s_blk = jax.lax.dot_general(
                qj, kb, ct_lanes, preferred_element_type=jnp.float32
            ) * scale + bias  # (BB, BQ, KC) fp32
            m_new = jnp.maximum(m, jnp.max(s_blk, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            e = jnp.exp(s_blk - m_new)
            pv = jax.lax.dot_general(
                e.astype(vb.dtype), vb, ct_keys,
                preferred_element_type=jnp.float32,
            )  # (BB, BQ, BW)
            return (
                m_new,
                l * alpha + jnp.sum(e, axis=-1, keepdims=True),
                acc * alpha + pv,
            )

        m0 = jnp.full((bb, bq, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bb, bq, 1), jnp.float32)
        a0 = jnp.zeros((bb, bq, bw), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, a0))
        l = jnp.maximum(l, 1e-30)  # fully-masked rows: no NaN (never real)
        return acc / l, m + jnp.log(l)

    if bw == dh:
        out, lrow = one_head(None)
        lse = jnp.broadcast_to(lrow, (bb, bq, 128))
    else:
        out = jnp.zeros((bb, bq, bw), jnp.float32)
        lse = jnp.zeros((bb, bq, 128), jnp.float32)
        for j, mj in enumerate(_lane_masks(bw, dh, q.dtype)):
            oj, lrow = one_head(mj)
            out = out + oj
            lse = lse + lrow * _lane_masks128(dh)[j]
    o_ref[...] = out.astype(o_ref.dtype)
    lse_ref[...] = lse


def _flash_specs(s, bw, bq):
    """BlockSpecs shared by the fwd/dq kernels: grid (batch, group, q-block)."""
    qspec = pl.BlockSpec((1, bq, bw), lambda bi, gi, qi: (bi, qi, gi),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, s, bw), lambda bi, gi, qi: (bi, 0, gi),
                          memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, s), lambda bi, gi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM)
    colspec = pl.BlockSpec((1, bq, 128), lambda bi, gi, qi: (bi, qi, gi),
                           memory_space=pltpu.VMEM)
    return qspec, kvspec, mspec, colspec


def _sdpa_flash_fwd_impl(q, k, v, mask_i32, n_head, interpret):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    tiles = _flash_tiles(s, bw, dh, q.dtype.itemsize)
    if tiles is None:  # past the resident envelope: stream everything
        bq, kc = _flash_stream_tiles(s, bw, dh, q.dtype.itemsize)
        return _sdpa_flash_fwd_stream_impl(
            q, k, v, mask_i32, n_head, interpret, bq, kc
        )
    bq, kc = tiles
    ng = d // bw
    qspec, kvspec, mspec, colspec = _flash_specs(s, bw, bq)
    kernel = functools.partial(
        _attn_kernel_flash_fwd, scale=1.0 / (dh**0.5), dh=dh, kc=kc
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, s, 128 * ng), jnp.float32),
        ),
        grid=(b, ng, s // bq),
        in_specs=[qspec, kvspec, kvspec, mspec],
        out_specs=(qspec, colspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=q.dtype.itemsize * b * s * d * 4,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32)


def _attn_kernel_flash_dq(q_ref, k_ref, v_ref, mask_ref, g_ref, lse_ref,
                          delta_ref, dq_ref, *, scale, dh, kc):
    q = q_ref[...]  # (BB, BQ, BW)
    go = g_ref[...]
    bb, bq, bw = q.shape
    nk = k_ref.shape[1] // kc
    ct_lanes = (((2,), (2,)), ((0,), (0,)))
    ct_keys = (((2,), (1,)), ((0,), (0,)))

    def one_head(qj, goj, lrow, drow):
        def body(i, acc):
            kb = k_ref[:, pl.ds(i * kc, kc), :]
            vb = v_ref[:, pl.ds(i * kc, kc), :]
            bias = jnp.where(
                mask_ref[:, :, pl.ds(i * kc, kc)] > 0, 0.0, NEG_INF
            )
            s_blk = jax.lax.dot_general(
                qj, kb, ct_lanes, preferred_element_type=jnp.float32
            ) * scale + bias
            p = jnp.exp(s_blk - lrow)  # (BB, BQ, KC) fp32
            dp = jax.lax.dot_general(
                goj, vb, ct_lanes, preferred_element_type=jnp.float32
            )
            ds = p * (dp - drow)
            return acc + jax.lax.dot_general(
                ds.astype(kb.dtype), kb, ct_keys,
                preferred_element_type=jnp.float32,
            ) * scale

        return jax.lax.fori_loop(
            0, nk, body, jnp.zeros((bb, bq, bw), jnp.float32)
        )

    lse = lse_ref[...]
    delta = delta_ref[...]
    if bw == dh:
        dq = one_head(q, go, _pick_col(lse, 0, dh), _pick_col(delta, 0, dh))
    else:
        dq = jnp.zeros((bb, bq, bw), jnp.float32)
        for j, mj in enumerate(_lane_masks(bw, dh, q.dtype)):
            dq = dq + one_head(
                q * mj, go * mj, _pick_col(lse, j, dh), _pick_col(delta, j, dh)
            ) * mj
    dq_ref[...] = dq.astype(dq_ref.dtype)


def _attn_kernel_flash_dkv(q_ref, k_ref, v_ref, mask_ref, g_ref, lse_ref,
                           delta_ref, dk_ref, dv_ref, *, scale, dh, qc):
    k = k_ref[...]  # (BB, KB, BW) — this grid step's key block
    v = v_ref[...]
    bb, kb, bw = k.shape
    nq = q_ref.shape[1] // qc
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)  # (BB, 1, KB)
    ct_lanes = (((2,), (2,)), ((0,), (0,)))
    ct_q = (((1,), (1,)), ((0,), (0,)))  # contract the query-chunk axis

    def one_head(kj, vj, mj, j):
        def body(i, carry):
            dk, dv = carry
            qb = q_ref[:, pl.ds(i * qc, qc), :]
            gob = g_ref[:, pl.ds(i * qc, qc), :]
            if mj is not None:
                qb = qb * mj
                gob = gob * mj
            lrow = _pick_col(lse_ref[:, pl.ds(i * qc, qc), :], j, dh)
            drow = _pick_col(delta_ref[:, pl.ds(i * qc, qc), :], j, dh)
            s_blk = jax.lax.dot_general(
                qb, kj, ct_lanes, preferred_element_type=jnp.float32
            ) * scale + bias  # (BB, QC, KB)
            p = jnp.exp(s_blk - lrow)
            dv_new = dv + jax.lax.dot_general(
                p.astype(gob.dtype), gob, ct_q,
                preferred_element_type=jnp.float32,
            )  # p^T dO: (BB, KB, BW)
            dp = jax.lax.dot_general(
                gob, vj, ct_lanes, preferred_element_type=jnp.float32
            )
            ds = p * (dp - drow)
            dk_new = dk + jax.lax.dot_general(
                ds.astype(qb.dtype), qb, ct_q,
                preferred_element_type=jnp.float32,
            ) * scale
            return dk_new, dv_new

        zero = jnp.zeros((bb, kb, bw), jnp.float32)
        return jax.lax.fori_loop(0, nq, body, (zero, zero))

    if bw == dh:
        dk, dv = one_head(k, v, None, 0)
    else:
        dk = jnp.zeros((bb, kb, bw), jnp.float32)
        dv = jnp.zeros_like(dk)
        for j, mj in enumerate(_lane_masks(bw, dh, k.dtype)):
            dkj, dvj = one_head(k * mj, v * mj, mj, j)
            dk, dv = dk + dkj, dv + dvj
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _flash_delta(out, grad, dh):
    """delta = per-(row, head) rowsum(dO ∘ O), laid out lane-broadcast to
    match the forward's lse output: (B, S, 128·n_groups) fp32. Pure XLA —
    it fuses into the surrounding backward elementwise ops."""
    b, s, d = out.shape
    h = d // dh
    dhead = jnp.sum(
        (out.astype(jnp.float32) * grad.astype(jnp.float32)).reshape(
            b, s, h, dh
        ),
        axis=-1,
    )  # (B, S, H)
    return jnp.repeat(dhead, min(dh, 128), axis=-1)


def _sdpa_flash_bwd_impl(q, k, v, mask_i32, grad, out, lse, n_head, interpret):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    tiles = _flash_tiles(s, bw, dh, q.dtype.itemsize)
    if tiles is None:  # past the resident envelope: stream everything
        bq, kc = _flash_stream_tiles(s, bw, dh, q.dtype.itemsize)
        return _sdpa_flash_bwd_stream_impl(
            q, k, v, mask_i32, grad, out, lse, n_head, interpret, bq, kc
        )
    bq, kc = tiles
    ng = d // bw
    scale = 1.0 / (dh**0.5)
    delta = _flash_delta(out, grad, dh)
    qspec, kvspec, mspec, colspec = _flash_specs(s, bw, bq)
    dq = pl.pallas_call(
        functools.partial(_attn_kernel_flash_dq, scale=scale, dh=dh, kc=kc),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, ng, s // bq),
        in_specs=[qspec, kvspec, kvspec, mspec, qspec, colspec, colspec],
        out_specs=qspec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * s * s * d,
            bytes_accessed=q.dtype.itemsize * b * s * d * 5,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, grad, lse, delta)
    # dK/dV: k-block grid; q/dO/lse/delta full-sequence resident
    kbspec = pl.BlockSpec((1, kc, bw), lambda bi, gi, ki: (bi, ki, gi),
                          memory_space=pltpu.VMEM)
    qfull = pl.BlockSpec((1, s, bw), lambda bi, gi, ki: (bi, 0, gi),
                         memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((1, 1, kc), lambda bi, gi, ki: (bi, 0, ki),
                        memory_space=pltpu.VMEM)
    colfull = pl.BlockSpec((1, s, 128), lambda bi, gi, ki: (bi, 0, gi),
                           memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_kernel_flash_dkv, scale=scale, dh=dh, qc=bq),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, ng, s // kc),
        in_specs=[qfull, kbspec, kbspec, mblk, qfull, colfull, colfull],
        out_specs=(kbspec, kbspec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * b * s * s * d,
            bytes_accessed=q.dtype.itemsize * b * s * d * 6,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, grad, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sdpa_pallas_flash(q, k, v, mask_i32, n_head, interpret):
    out, _ = _sdpa_flash_fwd_impl(q, k, v, mask_i32, n_head, interpret)
    return out


def _sdpa_pallas_flash_fwd(q, k, v, mask_i32, n_head, interpret):
    out, lse = _sdpa_flash_fwd_impl(q, k, v, mask_i32, n_head, interpret)
    return out, (q, k, v, mask_i32, out, lse)


def _sdpa_pallas_flash_bwd(n_head, interpret, res, grad):
    q, k, v, mask_i32, out, lse = res
    dq, dk, dv = _sdpa_flash_bwd_impl(
        q, k, v, mask_i32, grad, out, lse, n_head, interpret
    )
    return dq, dk, dv, None


_sdpa_pallas_flash.defvjp(_sdpa_pallas_flash_fwd, _sdpa_pallas_flash_bwd)


# ---------------------------------------------------------------------------
# Streaming flash kernels: unbounded sequence length.
#
# The resident kernels above keep one side of the attention full-sequence in
# VMEM (fwd/dq: K and V; dK/dV: Q, dO, lse, delta), which caps S at ~4k. The
# streaming variants below keep NOTHING full-sequence resident: the grid
# grows a 4th (chunk) dimension whose BlockSpecs stream the chunked operands
# through Pallas's own double-buffered DMA pipeline, and the online state
# (m/l/acc for the forward, the dq / dk / dv partial sums for the backward)
# lives in VMEM scratch that persists across the sequentially-executed inner
# grid steps — initialized at chunk 0, flushed to the output block at the
# last chunk (the block's index map is constant along the chunk dimension,
# so Pallas writes it back to HBM exactly once). The streaming cost is the
# flash-standard re-read: the q-side operands are fetched once per key chunk
# (and K/V once per query chunk in dK/dV), so the resident kernels remain
# the dispatch default whenever their envelope fits; `_sdpa_flash_*_impl`
# fall through to these only past it. Math is identical (same sub-head lane
# masking, same fp32 softmax/accumulation dtype strategy).
# ---------------------------------------------------------------------------


def _attn_kernel_flash_fwd_stream(q_ref, k_ref, v_ref, mask_ref, o_ref,
                                  lse_ref, m_s, l_s, acc_s, *, scale, dh):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_s[...] = jnp.full(m_s.shape, NEG_INF, jnp.float32)
        l_s[...] = jnp.zeros(l_s.shape, jnp.float32)
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    q = q_ref[...]   # (1, BQ, BW)
    kb = k_ref[...]  # (1, KC, BW)
    vb = v_ref[...]
    bw = q.shape[-1]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)  # (1, 1, KC)
    ct_lanes = (((2,), (2,)), ((0,), (0,)))
    ct_keys = (((2,), (1,)), ((0,), (0,)))
    subs = [None] if bw == dh else _lane_masks(bw, dh, q.dtype)
    m_all, l_all, acc = m_s[...], l_s[...], acc_s[...]
    for j, mj in enumerate(subs):
        qj = q if mj is None else q * mj
        kj = kb if mj is None else kb * mj
        vj = vb if mj is None else vb * mj
        s_blk = jax.lax.dot_general(
            qj, kj, ct_lanes, preferred_element_type=jnp.float32
        ) * scale + bias  # (1, BQ, KC) fp32
        m_old = _pick_col(m_all, j, dh)  # (1, BQ, 1)
        l_old = _pick_col(l_all, j, dh)
        m_new = jnp.maximum(m_old, jnp.max(s_blk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(s_blk - m_new)
        pv = jax.lax.dot_general(
            e.astype(vj.dtype), vj, ct_keys, preferred_element_type=jnp.float32
        )  # (1, BQ, BW), zero outside sub-head j's lanes (vj is masked)
        l_new = l_old * alpha + jnp.sum(e, axis=-1, keepdims=True)
        sel = _lane_masks128(dh)[j]  # (1, 1, 128) fp32
        m_all = m_all * (1.0 - sel) + m_new * sel
        l_all = l_all * (1.0 - sel) + l_new * sel
        mjf = (1.0 if mj is None
               else _lane_masks(bw, dh, jnp.float32)[j][None])
        acc = acc * (1.0 + (alpha - 1.0) * mjf) + pv
    m_s[...], l_s[...], acc_s[...] = m_all, l_all, acc

    @pl.when(ki == nk - 1)
    def _flush():
        l = jnp.maximum(l_s[...], 1e-30)  # fully-masked rows: no NaN
        acc_f = acc_s[...]
        if bw == dh:  # single head per block: one scalar l per row
            acc_f = acc_f / jnp.maximum(_pick_col(l, 0, dh), 1e-30)
        else:  # BW == 128: l's lane layout matches acc's sub-head lanes
            acc_f = acc_f / l
        o_ref[...] = acc_f.astype(o_ref.dtype)
        lse_ref[...] = m_s[...] + jnp.log(l)


def _attn_kernel_flash_dq_stream(q_ref, k_ref, v_ref, mask_ref, g_ref,
                                 lse_ref, delta_ref, dq_ref, acc_s,
                                 *, scale, dh):
    ki = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        acc_s[...] = jnp.zeros(acc_s.shape, jnp.float32)

    q = q_ref[...]
    go = g_ref[...]
    kb = k_ref[...]
    vb = v_ref[...]
    bw = q.shape[-1]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)
    ct_lanes = (((2,), (2,)), ((0,), (0,)))
    ct_keys = (((2,), (1,)), ((0,), (0,)))
    subs = [None] if bw == dh else _lane_masks(bw, dh, q.dtype)
    acc = acc_s[...]
    lse = lse_ref[...]
    delta = delta_ref[...]
    for j, mj in enumerate(subs):
        qj = q if mj is None else q * mj
        goj = go if mj is None else go * mj
        lrow = _pick_col(lse, j, dh)
        drow = _pick_col(delta, j, dh)
        s_blk = jax.lax.dot_general(
            qj, kb, ct_lanes, preferred_element_type=jnp.float32
        ) * scale + bias
        p = jnp.exp(s_blk - lrow)
        dp = jax.lax.dot_general(
            goj, vb, ct_lanes, preferred_element_type=jnp.float32
        )
        ds = p * (dp - drow)
        dqj = jax.lax.dot_general(
            ds.astype(kb.dtype), kb, ct_keys,
            preferred_element_type=jnp.float32,
        ) * scale
        acc = acc + (dqj if mj is None else dqj * mj)
    acc_s[...] = acc

    @pl.when(ki == nk - 1)
    def _flush():
        dq_ref[...] = acc_s[...].astype(dq_ref.dtype)


def _attn_kernel_flash_dkv_stream(q_ref, k_ref, v_ref, mask_ref, g_ref,
                                  lse_ref, delta_ref, dk_ref, dv_ref,
                                  dk_s, dv_s, *, scale, dh):
    qi = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_s[...] = jnp.zeros(dk_s.shape, jnp.float32)
        dv_s[...] = jnp.zeros(dv_s.shape, jnp.float32)

    k = k_ref[...]  # (1, KC, BW) — this (outer) grid step's key block
    v = v_ref[...]
    qb = q_ref[...]  # (1, QC, BW) — this (inner) grid step's query chunk
    gob = g_ref[...]
    bw = k.shape[-1]
    bias = jnp.where(mask_ref[...] > 0, 0.0, NEG_INF)  # (1, 1, KC)
    ct_lanes = (((2,), (2,)), ((0,), (0,)))
    ct_q = (((1,), (1,)), ((0,), (0,)))
    subs = [None] if bw == dh else _lane_masks(bw, dh, k.dtype)
    dk, dv = dk_s[...], dv_s[...]
    for j, mj in enumerate(subs):
        kj = k if mj is None else k * mj
        vj = v if mj is None else v * mj
        qbj = qb if mj is None else qb * mj
        gobj = gob if mj is None else gob * mj
        lrow = _pick_col(lse_ref[...], j, dh)
        drow = _pick_col(delta_ref[...], j, dh)
        s_blk = jax.lax.dot_general(
            qbj, kj, ct_lanes, preferred_element_type=jnp.float32
        ) * scale + bias  # (1, QC, KC)
        p = jnp.exp(s_blk - lrow)
        dv = dv + jax.lax.dot_general(
            p.astype(gobj.dtype), gobj, ct_q,
            preferred_element_type=jnp.float32,
        )  # p^T dO: (1, KC, BW)
        dp = jax.lax.dot_general(
            gobj, vj, ct_lanes, preferred_element_type=jnp.float32
        )
        ds = p * (dp - drow)
        dk = dk + jax.lax.dot_general(
            ds.astype(qbj.dtype), qbj, ct_q,
            preferred_element_type=jnp.float32,
        ) * scale
    dk_s[...], dv_s[...] = dk, dv

    @pl.when(qi == nq - 1)
    def _flush():
        dk_ref[...] = dk_s[...].astype(dk_ref.dtype)
        dv_ref[...] = dv_s[...].astype(dv_ref.dtype)


def _flash_stream_specs(bq, kc, bw):
    """BlockSpecs for the streaming fwd/dq grids (batch, group, q-blk, k-chunk):
    q-side blocks are constant along the inner (k-chunk) dimension so Pallas
    fetches them once per q block; k/v/mask chunks stream along it."""
    qspec = pl.BlockSpec((1, bq, bw), lambda bi, gi, qi, ki: (bi, qi, gi),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, kc, bw), lambda bi, gi, qi, ki: (bi, ki, gi),
                         memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, kc), lambda bi, gi, qi, ki: (bi, 0, ki),
                         memory_space=pltpu.VMEM)
    colspec = pl.BlockSpec((1, bq, 128), lambda bi, gi, qi, ki: (bi, qi, gi),
                           memory_space=pltpu.VMEM)
    return qspec, kspec, mspec, colspec


def _sdpa_flash_fwd_stream_impl(q, k, v, mask_i32, n_head, interpret, bq, kc):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    ng = d // bw
    qspec, kspec, mspec, colspec = _flash_stream_specs(bq, kc, bw)
    kernel = functools.partial(
        _attn_kernel_flash_fwd_stream, scale=1.0 / (dh**0.5), dh=dh
    )
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, s, 128 * ng), jnp.float32),
        ),
        grid=(b, ng, s // bq, s // kc),
        in_specs=[qspec, kspec, kspec, mspec],
        out_specs=(qspec, colspec),
        scratch_shapes=[
            pltpu.VMEM((1, bq, 128), jnp.float32),
            pltpu.VMEM((1, bq, 128), jnp.float32),
            pltpu.VMEM((1, bq, bw), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # K/V re-read once per q block (s//bq sweeps); q/out once
            flops=2 * 2 * b * s * s * d,
            bytes_accessed=q.dtype.itemsize * b * s * d * (2 + 2 * (s // bq)),
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32)


def _sdpa_flash_bwd_stream_impl(q, k, v, mask_i32, grad, out, lse, n_head,
                                interpret, bq, kc):
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    ng = d // bw
    scale = 1.0 / (dh**0.5)
    delta = _flash_delta(out, grad, dh)
    qspec, kspec, mspec, colspec = _flash_stream_specs(bq, kc, bw)
    dq = pl.pallas_call(
        functools.partial(_attn_kernel_flash_dq_stream, scale=scale, dh=dh),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, ng, s // bq, s // kc),
        in_specs=[qspec, kspec, kspec, mspec, qspec, colspec, colspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((1, bq, bw), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # K/V re-read once per q block; q/grad/dq/lse/delta once
            flops=3 * 2 * b * s * s * d,
            bytes_accessed=q.dtype.itemsize * b * s * d * (5 + 2 * (s // bq)),
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, grad, lse, delta)
    # dK/dV: k chunks on the outer grid dim, q chunks streamed on the inner
    kbspec = pl.BlockSpec((1, kc, bw), lambda bi, gi, ki, qi: (bi, ki, gi),
                          memory_space=pltpu.VMEM)
    qchunk = pl.BlockSpec((1, bq, bw), lambda bi, gi, ki, qi: (bi, qi, gi),
                          memory_space=pltpu.VMEM)
    mblk = pl.BlockSpec((1, 1, kc), lambda bi, gi, ki, qi: (bi, 0, ki),
                        memory_space=pltpu.VMEM)
    colchunk = pl.BlockSpec((1, bq, 128), lambda bi, gi, ki, qi: (bi, qi, gi),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_attn_kernel_flash_dkv_stream, scale=scale, dh=dh),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, ng, s // kc, s // bq),
        in_specs=[qchunk, kbspec, kbspec, mblk, qchunk, colchunk, colchunk],
        out_specs=(kbspec, kbspec),
        scratch_shapes=[
            pltpu.VMEM((1, kc, bw), jnp.float32),
            pltpu.VMEM((1, kc, bw), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # q-side (q/grad/lse/delta) re-read once per k block (s//kc
            # sweeps); k/v/dk/dv once
            flops=4 * 2 * b * s * s * d,
            bytes_accessed=q.dtype.itemsize * b * s * d * (4 + 4 * (s // kc)),
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, grad, lse, delta)
    return dq, dk, dv


def attention_flash(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    *,
    n_head: int,
    interpret: bool = False,
    sharded: bool = False,
) -> jax.Array:
    """Sequence-blocked (flash) attention: (B, S, D) -> (B, S, D).

    Long-context entry point: pads S to a 128-multiple when needed (masked
    keys / sliced rows, exact incl. gradients) and raises only if the head
    dim has no Mosaic-blockable layout — past the resident kernels' VMEM
    envelope the impl streams every operand per-chunk (see the streaming
    section), so S itself is unbounded. ``sharded``
    wraps the kernels in the batch-partitioning custom_partitioning for
    multi-chip meshes (see the multi-chip section; long-context runs are
    DP-dominant, so TP lanes cost one gather before the kernel)."""
    b, s, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    if bw is None or d % bw != 0:
        raise ValueError(
            f"attention_flash: head_dim={dh} has no Mosaic-blockable "
            "heads-last layout (needs Dh % 128 == 0 or 128 % Dh == 0)"
        )
    pad = (-s) % 128
    if pad:
        zpad = ((0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, zpad) for t in (q, k, v))
        key_mask_full = jnp.zeros((b, s + pad), bool)
        if key_mask is None:
            key_mask = key_mask_full.at[:, :s].set(True)
        else:
            key_mask = key_mask_full.at[:, :s].set(key_mask)
    if not _flash_available(s + pad, bw, dh, q.dtype.itemsize):
        # defensive: stream tiles exist for any 128-multiple S
        raise ValueError(
            f"attention_flash: no flash tiling for S={s} at this "
            "dtype/head width (see ops/attention.py flash sections)"
        )
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    if sharded:
        out = _flash_sharded(n_head, interpret)(q, k, v, mask_i32)
    else:
        out = _sdpa_pallas_flash(q, k, v, mask_i32, n_head, interpret)
    return out[:, :s] if pad else out


# ---------------------------------------------------------------------------
# Multi-chip: GSPMD-partitioned kernels (impl="pallas_sharded").
#
# pallas_call is an opaque custom call — the SPMD partitioner cannot split it
# on its own, so under a ('data','model') mesh a bare kernel would force its
# operands replicated (an all-gather of the whole batch onto every chip).
# jax.experimental.custom_partitioning teaches the partitioner the kernel's
# sharding contract instead: attention is batch-local, so we partition on
# the BATCH axes of the incoming sharding and declare every other dim
# replicated; the partitioner inserts whatever reshards that implies (e.g.
# an all-gather over 'model' of TP-sharded qkv lanes — megatron column-
# parallel in_proj output) and each chip runs the unmodified Mosaic kernel
# on its batch shard. Forward AND backward are partitioned this way (both
# are pallas_calls), wired together with custom_vjp.
#
# Not routed automatically from impl="auto"/"pallas": custom_partitioning has
# no vmap batching rule, and the robustness sweeps vmap the kernel over a
# variant axis. Mesh users opt in via impl="pallas_sharded" (train.py does
# this when --data_parallel/--model_parallel request a mesh);
# "pallas_interpret_sharded" is the CPU-mesh test/dryrun mode.
# ---------------------------------------------------------------------------


def _batch_axes(arg_shape):
    spec = getattr(getattr(arg_shape, "sharding", None), "spec", None)
    if spec is not None and len(spec) > 0:
        return spec[0]
    return None


def _sharding_rule(arg_ranks, out_ranks):
    """Einsum-like shardy rule sharing ONE factor — the leading batch dim —
    across all operands/results; every other dim is an independent factor
    (no propagation, replicated unless `partition` says otherwise)."""
    n = iter(range(sum(arg_ranks) + sum(out_ranks)))

    def term(rank):
        return " ".join(["b"] + [f"f{next(n)}" for _ in range(rank - 1)])

    lhs = ", ".join(term(r) for r in arg_ranks)
    rhs = ", ".join(term(r) for r in out_ranks)
    return f"{lhs} -> {rhs}"


def _batch_partitioned(impl, arg_ranks, out_ranks):
    """Wrap `impl` (a pallas entry point on global shapes) so GSPMD runs it
    per batch shard: all operands/results forced to P(batch_axes, None, ...)
    where batch_axes is dim 0 of the first operand's incoming sharding."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    cp = custom_partitioning(impl)

    def shard(mesh, b, rank):
        return NamedSharding(mesh, P(b, *([None] * (rank - 1))))

    def out_shardings(mesh, b, result_shape):
        if isinstance(result_shape, (tuple, list)):
            return tuple(shard(mesh, b, len(r.shape)) for r in result_shape)
        return shard(mesh, b, len(result_shape.shape))

    def infer(mesh, arg_shapes, result_shape):
        return out_shardings(mesh, _batch_axes(arg_shapes[0]), result_shape)

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes[0])
        arg_sh = tuple(shard(mesh, b, len(a.shape)) for a in arg_shapes)
        return mesh, impl, out_shardings(mesh, b, result_shape), arg_sh

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=_sharding_rule(arg_ranks, out_ranks),
    )
    return cp


@functools.lru_cache(maxsize=None)
def _packed_sharded(n_head: int, interpret: bool):
    def fwd_impl(qkv, mask_i32):
        return _sdpa_packed_fwd_impl(qkv, mask_i32, n_head, interpret)

    def bwd_impl(qkv, mask_i32, grad):
        return _sdpa_packed_bwd_impl(qkv, mask_i32, grad, n_head, interpret)

    fwd_cp = _batch_partitioned(fwd_impl, (3, 3), (3,))
    bwd_cp = _batch_partitioned(bwd_impl, (3, 3, 3), (3,))

    @jax.custom_vjp
    def f(qkv, mask_i32):
        return fwd_cp(qkv, mask_i32)

    def f_fwd(qkv, mask_i32):
        return fwd_cp(qkv, mask_i32), (qkv, mask_i32)

    def f_bwd(res, grad):
        qkv, mask_i32 = res
        return bwd_cp(qkv, mask_i32, grad), None

    f.defvjp(f_fwd, f_bwd)
    return f


def _tp_shard_count(mesh, d_ax) -> int:
    axes = d_ax if isinstance(d_ax, tuple) else (d_ax,)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def _tp_axes_on_hidden(mesh, q_shape, n_head):
    """TP axes on the hidden (last) dim of a heads-last operand, kept only
    when each shard holds whole Mosaic-blockable heads (d_local % dh == 0
    and d_local % bw == 0) — the condition under which attention stays
    head-local per chip; None means replicate the hidden dim (one gather)."""
    spec = getattr(getattr(q_shape, "sharding", None), "spec", None)
    if spec is None or len(spec) < 3 or spec[2] is None:
        return None
    shards = _tp_shard_count(mesh, spec[2])
    d = q_shape.shape[-1]
    dh = d // n_head
    bw = _hl_block_width(dh)
    if bw is None or d % shards:
        return None
    d_local = d // shards
    if d_local % dh or d_local % bw:
        return None
    return spec[2]


def _head_partitioned_cp(impl_for, n_head, rule, n_args, n_out):
    """custom_partitioning scaffold shared by the whole-seq and flash
    head-partitioned wrappers: batch partitioning always, plus a KEPT
    tensor-parallel sharding of the hidden dim when the local shard is
    whole Mosaic-blockable heads (see `_tp_axes_on_hidden`) — attention is
    head-local, so each chip runs the kernel on its own heads with ZERO
    collectives (the megatron pattern: column-parallel q/k/v ->
    head-sharded attention -> row-parallel output projection); falls back
    to replicating the hidden dim (one gather) when the shard boundary
    would split a head/block. Operand 3 is the (B, 1, S) mask (batch-only
    sharding); every other operand/result rides P(b, None, d_ax) —
    including lse-like side tensors, whose 128·n_groups last dim splits on
    whole groups exactly when the hidden dim splits on whole blocks."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    impl = impl_for(n_head)  # global-shape trace / single-shard lowering
    cp = custom_partitioning(impl)

    def _shardings(mesh, b, d_ax):
        xsh = NamedSharding(mesh, P(b, None, d_ax))
        msh = NamedSharding(mesh, P(b, None, None))
        args = tuple(msh if i == 3 else xsh for i in range(n_args))
        res = (xsh,) * n_out if n_out > 1 else xsh
        return args, res

    def infer(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes[0])
        d_ax = _tp_axes_on_hidden(mesh, arg_shapes[0], n_head)
        return _shardings(mesh, b, d_ax)[1]

    def partition(mesh, arg_shapes, result_shape):
        b = _batch_axes(arg_shapes[0])
        d_ax = _tp_axes_on_hidden(mesh, arg_shapes[0], n_head)
        args, res = _shardings(mesh, b, d_ax)
        if d_ax is None:
            lower = impl
        else:
            lower = impl_for(n_head // _tp_shard_count(mesh, d_ax))
        return mesh, lower, res, args

    cp.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return cp


def _hl_head_partitioned(n_head, interpret, *, bwd):
    """Head-partitioned whole-sequence heads-last kernels (see
    `_head_partitioned_cp` for the sharding contract)."""
    if bwd:
        def impl_for(n_local):
            def impl(q, k, v, mask_i32, grad):
                return _sdpa_hl_bwd_impl(
                    q, k, v, mask_i32, grad, n_local, interpret
                )
            return impl
        # q, k, v, grad and the outputs all share the hidden-dim factor 'd'
        # (shardy propagates a TP sharding across them); mask shares batch.
        rule = ("b s1 d, b s2 d, b s3 d, b m1 s4, b s5 d "
                "-> b s6 d, b s7 d, b s8 d")
        return _head_partitioned_cp(impl_for, n_head, rule, 5, 3)

    def impl_for(n_local):
        def impl(q, k, v, mask_i32):
            return _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_local, interpret)
        return impl
    rule = "b s1 d, b s2 d, b s3 d, b m1 s4 -> b s5 d"
    return _head_partitioned_cp(impl_for, n_head, rule, 4, 1)


@functools.lru_cache(maxsize=None)
def _hl_sharded(n_head: int, interpret: bool):
    fwd_cp = _hl_head_partitioned(n_head, interpret, bwd=False)
    bwd_cp = _hl_head_partitioned(n_head, interpret, bwd=True)

    @jax.custom_vjp
    def f(q, k, v, mask_i32):
        return fwd_cp(q, k, v, mask_i32)

    def f_fwd(q, k, v, mask_i32):
        return fwd_cp(q, k, v, mask_i32), (q, k, v, mask_i32)

    def f_bwd(res, grad):
        q, k, v, mask_i32 = res
        dq, dk, dv = bwd_cp(q, k, v, mask_i32, grad)
        return dq, dk, dv, None

    f.defvjp(f_fwd, f_bwd)
    return f


@functools.lru_cache(maxsize=None)
def _hf_sharded(interpret: bool):
    """Heads-first (B, H, S, Dh) partitioned kernel — the fallback family for
    head dims with no Mosaic-blockable heads-last layout."""

    def fwd_impl(q, k, v, mask_i32):
        return _sdpa_pallas_fwd_impl(q, k, v, mask_i32, interpret=interpret)

    def bwd_impl(q, k, v, mask_i32, grad):
        return _sdpa_bwd_impl(q, k, v, mask_i32, grad, interpret)

    fwd_cp = _batch_partitioned(fwd_impl, (4, 4, 4, 3), (4,))
    bwd_cp = _batch_partitioned(bwd_impl, (4, 4, 4, 3, 4), (4, 4, 4))

    @jax.custom_vjp
    def f(q, k, v, mask_i32):
        return fwd_cp(q, k, v, mask_i32)

    def f_fwd(q, k, v, mask_i32):
        return fwd_cp(q, k, v, mask_i32), (q, k, v, mask_i32)

    def f_bwd(res, grad):
        q, k, v, mask_i32 = res
        dq, dk, dv = bwd_cp(q, k, v, mask_i32, grad)
        return dq, dk, dv, None

    f.defvjp(f_fwd, f_bwd)
    return f


def _flash_head_partitioned(n_head, interpret, *, bwd):
    """Head-partitioned flash kernels (see `_head_partitioned_cp` for the
    sharding contract; the lse side tensor's 128·n_groups last dim rides
    the same TP axes — whole-head shards split it on whole groups)."""
    if bwd:
        def impl_for(n_local):
            def impl(q, k, v, mask_i32, grad, out, lse):
                return _sdpa_flash_bwd_impl(
                    q, k, v, mask_i32, grad, out, lse, n_local, interpret
                )
            return impl
        # q/k/v/grad/out and the grads share the hidden-dim factor 'd';
        # lse has its own last-dim factor (different size, same axes —
        # assigned by the closures, not the rule); mask shares batch only.
        rule = ("b s1 d, b s2 d, b s3 d, b m1 s4, b s5 d, b s6 d, b s7 e "
                "-> b s8 d, b s9 d, b s10 d")
        return _head_partitioned_cp(impl_for, n_head, rule, 7, 3)

    def impl_for(n_local):
        def impl(q, k, v, mask_i32):
            return _sdpa_flash_fwd_impl(q, k, v, mask_i32, n_local, interpret)
        return impl
    rule = "b s1 d, b s2 d, b s3 d, b m1 s4 -> b s5 d, b s6 e"
    return _head_partitioned_cp(impl_for, n_head, rule, 4, 2)


@functools.lru_cache(maxsize=None)
def _flash_sharded(n_head: int, interpret: bool):
    """Mesh-partitioned flash kernels: batch (DP) partitioning always, and
    megatron head-sharded TP (zero attention collectives) when the incoming
    hidden-dim sharding lands on whole blockable heads — same contract as
    the whole-seq `_hl_sharded` family; the forward's lse side-output
    shards on batch and (for whole-head TP) its group'd last dim."""
    fwd_cp = _flash_head_partitioned(n_head, interpret, bwd=False)
    bwd_cp = _flash_head_partitioned(n_head, interpret, bwd=True)

    @jax.custom_vjp
    def f(q, k, v, mask_i32):
        out, _ = fwd_cp(q, k, v, mask_i32)
        return out

    def f_fwd(q, k, v, mask_i32):
        out, lse = fwd_cp(q, k, v, mask_i32)
        return out, (q, k, v, mask_i32, out, lse)

    def f_bwd(res, grad):
        q, k, v, mask_i32, out, lse = res
        dq, dk, dv = bwd_cp(q, k, v, mask_i32, grad, out, lse)
        return dq, dk, dv, None

    f.defvjp(f_fwd, f_bwd)
    return f


_SHARDED_IMPLS = ("pallas_sharded", "pallas_interpret_sharded")

# --- sequence parallelism (ring attention) routing ------------------------
# attn_impl='ring' sends the model's attention through ops/ring.py: the
# sequence shards over a mesh axis and K/V blocks rotate the ICI ring
# (lax.ppermute) with exact log-sum-exp merging. The mesh is process-global
# run configuration (like the distributed runtime itself), registered once
# by the launcher (train.py --sequence_parallel) rather than threaded
# through every model attribute.
_RING_IMPLS = ("ring", "ring_interpret")
_ring_cfg = {"mesh": None, "seq_axis": "seq", "batch_axis": "data"}


def configure_ring_mesh(mesh, *, seq_axis: str = "seq",
                        batch_axis: str = "data") -> None:
    """Register the mesh that ``attn_impl='ring'`` shard_maps over.

    ``mesh`` must carry ``seq_axis``; the batch additionally shards over
    ``batch_axis`` when the mesh has it (each data slice runs its own
    independent ring). Pass ``mesh=None`` to deactivate. Call BEFORE model
    init: flax's ``init`` traces the forward, which routes through the
    ring the moment the impl is 'ring'."""
    if mesh is not None and seq_axis not in mesh.axis_names:
        raise ValueError(
            f"configure_ring_mesh: mesh {dict(mesh.shape)} has no "
            f"'{seq_axis}' axis"
        )
    _ring_cfg.update(mesh=mesh, seq_axis=seq_axis, batch_axis=batch_axis)


def _ring_route(q, k, v, key_mask, n_head: int, interpret: bool):
    from multimodal_uncertainty_tpu.ops.ring import ring_attention_sharded

    mesh = _ring_cfg["mesh"]
    if mesh is None:
        raise ValueError(
            "attn_impl='ring' requires a registered sequence mesh: call "
            "ops.attention.configure_ring_mesh(mesh) (train.py does this "
            "for --sequence_parallel > 1) before building/initializing "
            "the model"
        )
    batch_axis = _ring_cfg["batch_axis"]
    if batch_axis not in mesh.axis_names or mesh.shape[batch_axis] <= 1:
        batch_axis = None
    run = ring_attention_sharded(
        mesh, n_head=n_head, seq_axis=_ring_cfg["seq_axis"],
        batch_axis=batch_axis, interpret=interpret,
    )
    return run(q, k, v, key_mask)


def _flash_available(s128, bw, dh, itemsize) -> bool:
    """Whether ANY flash tiling (resident or streaming) exists for this
    128-multiple S — true for every valid shape since the streaming kernels
    hold only per-chunk blocks; kept as the routing predicate so the XLA
    fallback stays reachable if a tiling regression ever reintroduces one."""
    return (_flash_tiles(s128, bw, dh, itemsize) is not None
            or _flash_stream_tiles(s128, bw, dh, itemsize) is not None)


_warned_fallback_dh = set()
_warned_flash_envelope = set()


def _warn_flash_envelope(s: int) -> None:
    """One-time note when S exceeds even the flash kernels' backward
    envelope and attention falls back to XLA (which materializes B·H·S²)."""
    if s in _warned_flash_envelope:
        return
    _warned_flash_envelope.add(s)
    logger.warning(
        "attention: S=%d exceeds the flash kernels' resident-residual "
        "backward envelope; falling back to XLA attention (HBM-heavy at "
        "this length — see ops/attention.py flash section).", s,
    )


def _warn_hl_fallback(dh: int) -> None:
    """One-time runtime note when a head dim takes the relayout fallback
    (measured at ~8-15% of step time on the round-2 profiles — see
    BASELINE.md 'kernel coverage' and docs/ARCHITECTURE.md)."""
    if dh in _warned_fallback_dh:
        return
    _warned_fallback_dh.add(dh)
    logger.warning(
        "attention: head_dim=%d has no Mosaic-blockable heads-last layout "
        "(needs Dh %% 128 == 0 or 128 %% Dh == 0); falling back to the "
        "(B, H, S, Dh) relayout path (~8-15%% step-time cost at this op's "
        "round-2 profile share).", dh,
    )


def attention_qkv_packed(
    qkv: jax.Array,
    key_mask: Optional[jax.Array] = None,
    *,
    n_head: int,
    impl: str = "auto",
) -> jax.Array:
    """Attention straight off a packed QKV projection: (B, S, 3D) -> (B, S, D).

    Avoids materializing the q/k/v last-dim slices as separate HBM buffers
    (pallas reads three views of the one operand), on top of the heads-last
    layout savings."""
    b, s, d3 = qkv.shape
    assert d3 % (3 * n_head) == 0, (d3, n_head)
    d = d3 // 3
    dh = d // n_head
    bw = _hl_block_width(dh)
    if impl in _RING_IMPLS:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return _ring_route(q, k, v, key_mask, n_head,
                           impl == "ring_interpret")
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if (
        impl == "xla"
        or bw is None
        or d % bw != 0
        or impl in ("flash", "flash_interpret")  # explicit flash request
        or (impl in ("pallas", "pallas_interpret") + _SHARDED_IMPLS
            and not _hl_whole_seq_fits(b, s, bw, dh, qkv.dtype.itemsize))
    ):
        # No Mosaic-blockable layout for this head dim (see _hl_block_width),
        # an explicit flash request, or a sequence too long for the whole-seq
        # score plane: route through heads-last (which honors flash impls
        # and escalates to the flash kernels past the budget) / XLA.
        if impl != "xla" and (bw is None or d % bw != 0):
            _warn_hl_fallback(dh)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return attention_heads_last(q, k, v, key_mask, n_head=n_head, impl=impl)
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    if impl in _SHARDED_IMPLS:
        return _packed_sharded(n_head, impl == "pallas_interpret_sharded")(
            qkv, mask_i32
        )
    return _sdpa_pallas_packed(qkv, mask_i32, n_head, impl == "pallas_interpret")


def attention_heads_last(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    *,
    n_head: int,
    impl: str = "auto",
) -> jax.Array:
    """Multi-head attention on heads-packed tensors: (B, S, D) -> (B, S, D).

    Drop-in for the reshape(B,S,H,Dh)->transpose->sdpa->transpose->reshape
    pattern, but without the four HBM relayouts per call (and six more in
    the backward) that the (B, H, S, Dh) interface costs. Dispatch mirrors
    :func:`scaled_dot_product_attention`.
    """
    b, s, d = q.shape
    assert d % n_head == 0, (d, n_head)
    dh = d // n_head
    bw = _hl_block_width(dh)
    if impl in _RING_IMPLS:
        return _ring_route(q, k, v, key_mask, n_head,
                           impl == "ring_interpret")
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl in ("flash", "flash_interpret"):
        return attention_flash(
            q, k, v, key_mask, n_head=n_head, interpret="interpret" in impl
        )
    if (
        impl in ("pallas", "pallas_interpret") + _SHARDED_IMPLS
        and bw is not None
        and d % bw == 0
        and not _hl_whole_seq_fits(b, s, bw, dh, q.dtype.itemsize)
    ):
        # whole-seq score plane won't fit VMEM at this S: escalate to the
        # sequence-blocked flash kernels (resident-residual while their
        # envelope holds, then the unbounded streaming variants; the XLA
        # fallback below is defensive — stream tiles exist for any S)
        interp = "interpret" in impl
        if _flash_available(s + (-s) % 128, bw, dh, q.dtype.itemsize):
            return attention_flash(
                q, k, v, key_mask, n_head=n_head, interpret=interp,
                sharded=impl in _SHARDED_IMPLS,
            )
        _warn_flash_envelope(s)
        impl = "xla"
    if impl == "xla" or bw is None or d % bw != 0:
        # XLA path, and the fallback for head dims with no Mosaic-blockable
        # packed-last-dim layout (see _hl_block_width): relayout to
        # (B, H, S, Dh) and use the heads-first kernel / XLA attention.
        if impl != "xla":
            _warn_hl_fallback(dh)

        def heads(t):
            return t.reshape(b, s, n_head, dh).transpose(0, 2, 1, 3)

        out = scaled_dot_product_attention(
            heads(q), heads(k), heads(v), key_mask, impl=impl
        )
        return out.transpose(0, 2, 1, 3).reshape(b, s, d)
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    if impl in _SHARDED_IMPLS:
        return _hl_sharded(n_head, impl == "pallas_interpret_sharded")(
            q, k, v, mask_i32
        )
    return _sdpa_pallas_hl(q, k, v, mask_i32, n_head, impl == "pallas_interpret")


def attention_heads_last_dropout(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    *,
    n_head: int,
    rate: float,
    rng: jax.Array,
    impl: str = "auto",
) -> jax.Array:
    """:func:`attention_heads_last` WITH attention-probs dropout fused into
    the heads-last kernel (VERDICT r4 #9) — the parity training regime
    (``--attention_probs_dropout 0.1``) no longer pays the XLA-path tax.

    The keep mask is ``jax.random.bernoulli(rng, 1-rate, (B,H,S,S))`` —
    the exact draw :func:`attention_probs_dropout` makes from the same
    key, so the kernel path matches the XLA path's output up to matmul
    accumulation order (asserted in test_attention_dropout_parity.py).
    Falls back to the XLA path whenever the kernel family can't serve the
    shape (head dims with no Mosaic-blockable layout, whole-seq VMEM
    overflow, sharded/ring/flash impls)."""
    if rate <= 0.0:
        return attention_heads_last(q, k, v, key_mask, n_head=n_head,
                                    impl=impl)
    b, s, d = q.shape
    assert d % n_head == 0, (d, n_head)
    dh = d // n_head
    bw = _hl_block_width(dh)
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    kernel_ok = (
        impl in ("pallas", "pallas_interpret")
        and bw is not None
        and d % bw == 0
        and _hl_drop_whole_seq_fits(b, s, bw, dh, q.dtype.itemsize)
    )
    if not kernel_ok:
        return attention_probs_dropout(
            q, k, v, key_mask, n_head=n_head, rate=rate, rng=rng
        )
    keep = jax.random.bernoulli(rng, 1.0 - rate, (b, n_head, s, s))
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    return _sdpa_pallas_hl_drop(
        q, k, v, mask_i32, keep.astype(jnp.uint8), n_head, float(rate),
        impl == "pallas_interpret",
    )


def sdpa_shard_mapped(mesh, *, impl: str = "pallas", batch_axis: str = "data"):
    """Batch-data-parallel wrapper: runs the fused kernel per shard via
    jax.shard_map (pallas_call is not GSPMD-partitioned on its own).

    Returns fn(q, k, v, key_mask) for arrays sharded on the leading batch
    axis. Attention is batch-local, so no collectives are needed.
    """
    from jax.sharding import PartitionSpec as P

    spec4 = P(batch_axis)

    def inner(q, k, v, key_mask):
        return scaled_dot_product_attention(q, k, v, key_mask, impl=impl)

    return jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec4, spec4, spec4, spec4),
        out_specs=spec4,
        check_vma=False,
    )


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    *,
    impl: str = "auto",
) -> jax.Array:
    """Dispatching entry point. q, k, v: (B, H, S, Dh); key_mask: (B, S) bool.

    impl: 'auto' (pallas on TPU, xla elsewhere), 'xla', 'pallas',
    'pallas_interpret' (for CPU tests of the kernel), 'pallas_sharded' /
    'pallas_interpret_sharded' (GSPMD batch-partitioned kernel for
    multi-chip meshes — see the custom_partitioning section).
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "xla":
        return sdpa_xla(q, k, v, key_mask)
    b, h, s, dh = q.shape
    if impl in ("pallas", "pallas_interpret", "flash",
                "flash_interpret") + _SHARDED_IMPLS:
        bw = _hl_block_width(dh)
        need_flash = impl.startswith("flash") or (
            bw is not None
            and not _hl_whole_seq_fits(b, s, bw, dh, q.dtype.itemsize)
        )
        if need_flash and bw is not None and _flash_available(
            s + (-s) % 128, bw, dh, q.dtype.itemsize
        ):
            # long-S escalation: relayout to heads-last and run the
            # sequence-blocked kernels (the relayout cost is negligible
            # against S² attention at these lengths)
            def last(t):
                return t.transpose(0, 2, 1, 3).reshape(b, s, h * dh)

            out = attention_flash(
                last(q), last(k), last(v), key_mask, n_head=h,
                interpret="interpret" in impl,
                sharded=impl in _SHARDED_IMPLS,
            )
            return out.reshape(b, s, h, dh).transpose(0, 2, 1, 3)
        if need_flash:
            _warn_flash_envelope(s)
            return sdpa_xla(q, k, v, key_mask)
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    if impl in _SHARDED_IMPLS:
        return _hf_sharded(impl == "pallas_interpret_sharded")(q, k, v, mask_i32)
    return _sdpa_pallas(q, k, v, mask_i32, impl == "pallas_interpret")
