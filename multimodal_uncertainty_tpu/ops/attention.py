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
the reference's fp16-safe LayerNorm philosophy, ``src/model.py:174-180``).

Masking contract: ``key_mask`` is boolean (B, S), True = token is attendable.
Masked keys receive -1e30 before softmax — numerically identical to the
reference *physically removing* the tokens (their post-softmax weight is
exactly 0.0 in fp32), which is how the robustness sweeps implement
modality-ablation without dynamic shapes.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # blocks carry G heads: (1, G, S, Dh)
    q = q_ref[0].astype(jnp.float32)  # (G, S, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # (G, S, S)
    mask = mask_ref[0]  # (1, S) int32 keep flags -> broadcast over G, queries
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p,
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
    HBM-resident (S, S) intermediates."""
    q = q_ref[0].astype(jnp.float32)  # (G, S, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    bq = (((2,), (2,)), ((0,), (0,)))  # contract last dims, batch head axis
    scores = jax.lax.dot_general(q, k, bq, preferred_element_type=jnp.float32)
    scores = scores * scale
    mask = mask_ref[0]
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)[None]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (G, Sq, Sk)

    # dv = p^T g : contract the query axis
    dv = jax.lax.dot_general(
        p, g, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dp = g v^T
    dp = jax.lax.dot_general(
        g, v, bq, preferred_element_type=jnp.float32
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
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


def _sdpa_pallas_bwd(interpret, res, grad):
    q, k, v, mask_i32 = res
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
# docs/study round-2 profile). This variant keeps HBM tensors in (B, S, D)
# and splits heads INSIDE the kernel: each grid step (batch, head-group)
# reads a (1, S, G*Dh) slice of the packed last dim and reshapes in VMEM,
# where the transpose is register/VPU work instead of HBM traffic.
# ---------------------------------------------------------------------------


def _attn_kernel_hl(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    # one head per grid step: blocks are (1, S, Dh) slices of (B, S, D) —
    # already the per-head matrix, no reshape/transpose anywhere
    q = q_ref[0].astype(jnp.float32)  # (S, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (S, S)
    mask = mask_ref[0]  # (1, S) keep flags, broadcasts over queries
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, Dh)
    o_ref[0] = out.astype(o_ref.dtype)


def _hl_specs(s, dh):
    blk = lambda bi, hi: (bi, 0, hi)  # noqa: E731
    spec = pl.BlockSpec((1, s, dh), blk, memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec(
        (1, 1, s), lambda bi, hi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    return spec, mask_spec


def _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_head, interpret):
    b, s, d = q.shape
    dh = d // n_head
    spec, mask_spec = _hl_specs(s, dh)
    kernel = functools.partial(_attn_kernel_hl, scale=1.0 / (dh**0.5))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=(b, n_head),
        in_specs=[spec, spec, spec, mask_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_head * s * s * dh,
            bytes_accessed=4 * b * s * d * 3,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32)


def _attn_bwd_kernel_hl(q_ref, k_ref, v_ref, mask_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)  # (S, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    go = g_ref[0].astype(jnp.float32)
    ct = (((1,), (1,)), ((), ()))  # contract last dims
    scores = jax.lax.dot_general(q, k, ct, preferred_element_type=jnp.float32)
    scores = scores * scale
    mask = mask_ref[0]
    scores = scores + jnp.where(mask > 0, 0.0, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # (Sq, Sk)
    dv = jax.lax.dot_general(
        p, go, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # p^T go : (Sk, Dh)
    dp = jax.lax.dot_general(go, v, ct, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _sdpa_pallas_hl(q, k, v, mask_i32, n_head, interpret):
    return _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_head, interpret)


def _sdpa_pallas_hl_fwd(q, k, v, mask_i32, n_head, interpret):
    out = _sdpa_hl_fwd_impl(q, k, v, mask_i32, n_head, interpret)
    return out, (q, k, v, mask_i32)


def _sdpa_pallas_hl_bwd(n_head, interpret, res, grad):
    q, k, v, mask_i32 = res
    b, s, d = q.shape
    dh = d // n_head
    spec, mask_spec = _hl_specs(s, dh)
    kernel = functools.partial(_attn_bwd_kernel_hl, scale=1.0 / (dh**0.5))
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        grid=(b, n_head),
        in_specs=[spec, spec, spec, mask_spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n_head * s * s * dh,
            bytes_accessed=4 * b * s * d * 7,
            transcendentals=b * n_head * s * s,
        ),
    )(q, k, v, mask_i32, grad)
    return dq, dk, dv, None


_sdpa_pallas_hl.defvjp(_sdpa_pallas_hl_fwd, _sdpa_pallas_hl_bwd)


def _sdpa_packed_fwd_impl(qkv, mask_i32, n_head, interpret):
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    spec, mask_spec = _hl_specs(s, dh)
    # q/k/v are views of the SAME packed operand at different last-dim block
    # offsets — no slice materialization in HBM
    q_spec = pl.BlockSpec((1, s, dh), lambda bi, hi: (bi, 0, hi),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, s, dh), lambda bi, hi: (bi, 0, n_head + hi),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, s, dh), lambda bi, hi: (bi, 0, 2 * n_head + hi),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_attn_kernel_hl, scale=1.0 / (dh**0.5))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, s, d), qkv.dtype),
        grid=(b, n_head),
        in_specs=[q_spec, k_spec, v_spec, mask_spec],
        out_specs=spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n_head * s * s * dh,
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


def _sdpa_pallas_packed_bwd(n_head, interpret, res, grad):
    qkv, mask_i32 = res
    b, s, d3 = qkv.shape
    d = d3 // 3
    dh = d // n_head
    spec, mask_spec = _hl_specs(s, dh)
    q_spec = pl.BlockSpec((1, s, dh), lambda bi, hi: (bi, 0, hi),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, s, dh), lambda bi, hi: (bi, 0, n_head + hi),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, s, dh), lambda bi, hi: (bi, 0, 2 * n_head + hi),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(_attn_bwd_kernel_hl, scale=1.0 / (dh**0.5))
    part = jax.ShapeDtypeStruct((b, s, d), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(part, part, part),
        grid=(b, n_head),
        in_specs=[q_spec, k_spec, v_spec, mask_spec, spec],
        out_specs=(spec, spec, spec),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * b * n_head * s * s * dh,
            bytes_accessed=4 * b * s * d * 7,
            transcendentals=b * n_head * s * s,
        ),
    )(qkv, qkv, qkv, mask_i32, grad)
    return jnp.concatenate([dq, dk, dv], axis=-1), None


_sdpa_pallas_packed.defvjp(_sdpa_pallas_packed_fwd, _sdpa_pallas_packed_bwd)


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
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "xla":
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return attention_heads_last(q, k, v, key_mask, n_head=n_head, impl="xla")
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
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
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "xla":
        dh = d // n_head

        def heads(t):
            return t.reshape(b, s, n_head, dh).transpose(0, 2, 1, 3)

        out = sdpa_xla(heads(q), heads(k), heads(v), key_mask)
        return out.transpose(0, 2, 1, 3).reshape(b, s, d)
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    return _sdpa_pallas_hl(q, k, v, mask_i32, n_head, impl == "pallas_interpret")


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
    'pallas_interpret' (for CPU tests of the kernel).
    """
    if impl == "auto":
        impl = "pallas" if _on_tpu() else "xla"
    if impl == "xla":
        return sdpa_xla(q, k, v, key_mask)
    interpret = impl == "pallas_interpret"
    b, _, s, _ = q.shape
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    return _sdpa_pallas(q, k, v, mask_i32, interpret)
