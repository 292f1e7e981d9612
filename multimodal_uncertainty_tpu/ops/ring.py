"""Ring (sequence-parallel / context-parallel) attention over a mesh axis.

No reference counterpart (wooginawunan/multi-modal-uncertainty is
single-GPU with S <= 512 + ~200 image tokens — see reference train.py and
src/transformer.py): this is the TPU-native scale-out of the flash kernels
in ops/attention.py for contexts past one chip's HBM. The SEQUENCE is
sharded across a mesh axis; each chip keeps its Q/dO rows resident and the
K/V blocks rotate around the ICI ring with `lax.ppermute`. Per visiting
block each chip runs the local flash kernel (resident or streaming — the
dispatch in `_sdpa_flash_fwd_impl` composes unchanged, so per-chip S is
itself unbounded) and the per-block partials are merged with the exact
online-softmax (log-sum-exp) combination, all in fp32:

    m = max(lse_a, lse_b); w. = exp(lse. - m)
    out = (out_a w_a + out_b w_b) / (w_a + w_b);  lse = m + log(w_a + w_b)

The backward rides the same ring: with the GLOBAL merged lse (and delta
recomputed from the global out) the per-block flash backward yields the
true global-softmax gradient contributions, so dQ accumulates locally
while dK/dV travel WITH their K/V block and return home after a full
cycle (N ppermutes). Exactness holds per step — no re-normalization drift.

Collectives are nearest-neighbor permutes, the pattern ICI is built for;
compute per step is the local flash kernel, so overlap is XLA's to
schedule (double-buffered send-ahead is the documented extension).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .attention import (
    NEG_INF,
    _hl_block_width,
    _sdpa_flash_bwd_impl,
    _sdpa_flash_fwd_impl,
)


def _w_lanes(w, dh, d):
    """Map a lane-broadcast (B, S, 128·n_groups) weight plane onto the
    (B, S, D) output lanes. For Dh <= 128 the kernel's sub-head lane layout
    already aligns 1:1 with the hidden dim; for Dh > 128 each head's 128
    broadcast lanes expand to its Dh output lanes."""
    if dh <= 128:
        return w
    b, s, _ = w.shape
    ng = d // dh
    w4 = w.reshape(b, s, ng, 128)[..., :1]
    return jnp.broadcast_to(w4, (b, s, ng, dh)).reshape(b, s, d)


def _merge(out_a, lse_a, out_b, lse_b, dh, d):
    """Exact pairwise combination of two normalized flash partials (fp32)."""
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp(lse_a - m)
    wb = jnp.exp(lse_b - m)
    tot = wa + wb
    out = (out_a * _w_lanes(wa / tot, dh, d)
           + out_b * _w_lanes(wb / tot, dh, d))
    return out, m + jnp.log(tot)


def _ring_perm(axis_name):
    n = jax.lax.axis_size(axis_name)
    return n, [(i, (i + 1) % n) for i in range(n)]


def _ring_fwd(q, k, v, mask_i32, n_head, axis_name, interpret):
    n, perm = _ring_perm(axis_name)
    b, s_loc, d = q.shape
    dh = d // n_head
    ng = d // _hl_block_width(dh)
    out0 = jnp.zeros((b, s_loc, d), jnp.float32)
    lse0 = jnp.full((b, s_loc, 128 * ng), NEG_INF, jnp.float32)

    def compute(carry_out, k_c, v_c, m_c):
        out_m, lse_m = carry_out
        o_j, lse_j = _sdpa_flash_fwd_impl(q, k_c, v_c, m_c, n_head, interpret)
        return _merge(out_m, lse_m, o_j.astype(jnp.float32), lse_j, dh, d)

    def body(_, carry):
        out_m, lse_m, k_c, v_c, m_c = carry
        out_m, lse_m = compute((out_m, lse_m), k_c, v_c, m_c)
        k_c, v_c, m_c = (
            jax.lax.ppermute(t, axis_name, perm) for t in (k_c, v_c, m_c)
        )
        return out_m, lse_m, k_c, v_c, m_c

    # last visit peeled: its K/V/mask need no onward hop (n is static)
    out_m, lse_m, k_c, v_c, m_c = jax.lax.fori_loop(
        0, n - 1, body, (out0, lse0, k, v, mask_i32)
    )
    out, lse = compute((out_m, lse_m), k_c, v_c, m_c)
    return out.astype(q.dtype), lse


def _ring_bwd(q, k, v, mask_i32, grad, out, lse, n_head, axis_name,
              interpret):
    n, perm = _ring_perm(axis_name)

    def contrib(k_c, v_c, m_c):
        return _sdpa_flash_bwd_impl(
            q, k_c, v_c, m_c, grad, out, lse, n_head, interpret
        )

    def body(_, carry):
        dq_acc, k_c, v_c, m_c, dk_c, dv_c = carry
        dq_j, dk_j, dv_j = contrib(k_c, v_c, m_c)
        dq_acc = dq_acc + dq_j.astype(jnp.float32)
        dk_c = dk_c + dk_j.astype(jnp.float32)
        dv_c = dv_c + dv_j.astype(jnp.float32)
        # dK/dV travel WITH their K/V block: after the full cycle each
        # block is home carrying every chip's contribution
        k_c, v_c, m_c, dk_c, dv_c = (
            jax.lax.ppermute(t, axis_name, perm)
            for t in (k_c, v_c, m_c, dk_c, dv_c)
        )
        return dq_acc, k_c, v_c, m_c, dk_c, dv_c

    dq0 = jnp.zeros(q.shape, jnp.float32)
    z = jnp.zeros(k.shape, jnp.float32)
    # last visit peeled: only the finished dK/dV need the final hop home —
    # the K/V/mask buffers' nth rotation would be a dead transfer
    dq, k_c, v_c, m_c, dk, dv = jax.lax.fori_loop(
        0, n - 1, body, (dq0, k, v, mask_i32, z, z)
    )
    dq_j, dk_j, dv_j = contrib(k_c, v_c, m_c)
    dq = dq + dq_j.astype(jnp.float32)
    dk = jax.lax.ppermute(dk + dk_j.astype(jnp.float32), axis_name, perm)
    dv = jax.lax.ppermute(dv + dv_j.astype(jnp.float32), axis_name, perm)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ring_core(q, k, v, mask_i32, n_head, axis_name, interpret):
    out, _ = _ring_fwd(q, k, v, mask_i32, n_head, axis_name, interpret)
    return out


def _ring_core_fwd(q, k, v, mask_i32, n_head, axis_name, interpret):
    out, lse = _ring_fwd(q, k, v, mask_i32, n_head, axis_name, interpret)
    return out, (q, k, v, mask_i32, out, lse)


def _ring_core_bwd(n_head, axis_name, interpret, res, grad):
    q, k, v, mask_i32, out, lse = res
    dq, dk, dv = _ring_bwd(
        q, k, v, mask_i32, grad, out, lse, n_head, axis_name, interpret
    )
    return dq, dk, dv, None


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(q, k, v, key_mask=None, *, n_head: int, axis_name: str,
                   interpret: bool = False):
    """Sequence-parallel attention INSIDE a shard_map over ``axis_name``:
    operands are the LOCAL sequence shards — q/k/v (B, S_local, D),
    key_mask (B, S_local) or None — and the result is the local (B,
    S_local, D) rows of the exact global-softmax attention. S_local must
    be a 128-multiple (pad + mask at the caller — sequence sharding is a
    data-layout decision made where the batch is built)."""
    b, s_loc, d = q.shape
    dh = d // n_head
    bw = _hl_block_width(dh)
    if bw is None or d % bw != 0:
        raise ValueError(
            f"ring_attention: head_dim={dh} / hidden={d} has no "
            "Mosaic-blockable heads-last layout (needs Dh % 128 == 0 or "
            "128 % Dh == 0, and the hidden dim to split into whole blocks)"
        )
    if s_loc % 128:
        raise ValueError(
            f"ring_attention: local sequence shard {s_loc} must be a "
            "128-multiple (pad with masked keys at the caller)"
        )
    if key_mask is None:
        mask_i32 = jnp.ones((b, 1, s_loc), jnp.int32)
    else:
        mask_i32 = key_mask.astype(jnp.int32)[:, None, :]
    return _ring_core(q, k, v, mask_i32, n_head, axis_name, interpret)


def ring_attention_sharded(mesh, *, n_head: int, seq_axis: str = "model",
                           batch_axis: str | None = None,
                           interpret: bool = False):
    """shard_map-wrapped entry point: takes GLOBAL (B, S, D) operands with
    the sequence sharded over ``seq_axis`` (and optionally the batch over
    ``batch_axis`` — each data slice runs its own independent ring) plus a
    global (B, S) key mask (None = all keys live) and returns the global
    result with the same sharding; the hidden dim replicates."""
    from jax.sharding import PartitionSpec as P

    qspec = P(batch_axis, seq_axis, None)
    mspec = P(batch_axis, seq_axis)

    def f(q, k, v, key_mask):
        return ring_attention(
            q, k, v, key_mask, n_head=n_head, axis_name=seq_axis,
            interpret=interpret,
        )

    g = jax.shard_map(
        f, mesh=mesh, in_specs=(qspec, qspec, qspec, mspec),
        out_specs=qspec, check_vma=False,
    )

    def run(q, k, v, key_mask=None):
        if key_mask is None:
            key_mask = jnp.ones(q.shape[:2], bool)
        return g(q, k, v, key_mask)

    return run
