"""Pipeline parallelism: GPipe-style stage pipelining over a mesh axis.

No reference counterpart (wooginawunan/multi-modal-uncertainty is
single-GPU) and not needed at the reference workloads' depth — DP x TP
covers a v5e slice without bubbles (docs/ARCHITECTURE.md) — but it
completes the mesh-parallelism set (dp / tp / ep / sp / pp) for deeper
future model families, TPU-idiomatically:

* each device on the ``pipe`` axis holds ONE stage's parameters (the
  stacked-leading-dim layout: every param leaf gains a leading stage dim
  sharded over the axis, so HBM holds depth/P layers per chip);
* activations hop stage-to-stage with nearest-neighbor non-cyclic
  `lax.ppermute` (the pattern ICI is built for; unpaired receivers get
  zeros, which stage 0 ignores — it reads the microbatch stream);
* the schedule is ONE `lax.scan` of M + P - 1 ticks (M microbatches,
  P stages, the classic GPipe bubble): SPMD — every device runs the same
  step function on whatever activation just arrived;
* the backward needs no bespoke schedule: `jax.grad` through the scan
  autodiffs `ppermute` into the reverse-direction ring, yielding the
  mirrored backward pipeline, with the scan's saved residuals as the
  GPipe activation stash (wrap ``stage_fn`` in `jax.checkpoint` to trade
  those for recompute).

This is deliberately a primitive (like ops/ring.py), not a trainer knob:
stage_fn + stacked params in, last-stage outputs out.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def pipeline_apply(stage_fn: Callable, stacked_params, xs, *,
                   axis_name: str):
    """Run ``stage_fn`` as a P-stage pipeline INSIDE a shard_map over
    ``axis_name``.

    Args (all local views under shard_map):
      stage_fn: (params, x) -> y with y matching x's pytree structure,
        shapes, and dtypes (stages chain). ``x`` may be a single (mb, ...)
        array or a PYTREE of them — e.g. (activations, attention_mask)
        where the mask leaf passes through each stage unchanged, so
        masked encoders (BERT) pipeline without closing over a global
        batch constant that would desync from the microbatch stream.
      stacked_params: pytree whose leaves carry this device's stage slice
        with a leading stage dim of 1 (the global leaves are (P, ...)
        sharded over ``axis_name``) — squeezed here.
      xs: pytree of (M, mb, ...) microbatch streams, replicated across the
        axis (only stage 0 reads it).

    Returns the (M, mb, ...) last-stage output pytree — valid on the LAST
    device; under the `pipeline_sharded` wrapper the caller slices stage
    -1 of the stacked result.
    """
    tmap = jax.tree_util.tree_map
    p = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    params = tmap(lambda l: l[0], stacked_params)
    m = jax.tree_util.tree_leaves(xs)[0].shape[0]
    fwd_perm = [(i, i + 1) for i in range(n - 1)]  # non-cyclic: 0 gets zeros

    def step(carry, t):
        recv, ys = carry
        x_t = tmap(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, jnp.clip(t, 0, m - 1), keepdims=False
            ),
            xs,
        )
        inp = tmap(lambda a, r: jnp.where(p == 0, a, r), x_t, recv)
        out = stage_fn(params, inp)
        in_sd = tmap(lambda a: (a.shape, a.dtype), inp)
        out_sd = tmap(lambda a: (a.shape, a.dtype), out)
        if in_sd != out_sd:
            raise TypeError(
                "pipeline stage_fn must preserve pytree structure, shape "
                f"AND dtype so stages chain: got {in_sd} -> {out_sd}"
            )
        # last stage lands microbatch t-(n-1) at tick t (predicated write)
        idx = jnp.clip(t - (n - 1), 0, m - 1)
        row = tmap(
            lambda ybuf, o: jnp.where(
                t >= n - 1, o,
                jax.lax.dynamic_index_in_dim(ybuf, idx, keepdims=False),
            ),
            ys, out,
        )
        ys = tmap(
            lambda ybuf, r: jax.lax.dynamic_update_index_in_dim(
                ybuf, r, idx, 0
            ),
            ys, row,
        )
        recv = jax.lax.ppermute(out, axis_name, fwd_perm)
        return (recv, ys), None

    recv0 = tmap(lambda a: jnp.zeros(a.shape[1:], a.dtype), xs)
    ys0 = tmap(jnp.zeros_like, xs)
    (_, ys), _ = jax.lax.scan(step, (recv0, ys0), jnp.arange(m + n - 1))
    return ys


def pipeline_sharded(stage_fn: Callable, mesh, *, pipe_axis: str = "model",
                     data_axis: str = None):
    """shard_map-wrapped pipeline: returns fn(stacked_params, xs) -> ys.

    ``stacked_params`` leaves are GLOBAL (P, ...) arrays sharded over
    ``pipe_axis`` (stage p's slice on device p); ``xs`` is the global
    (M, mb, ...) microbatch stream (replicated over ``pipe_axis``; its
    per-microbatch batch dim shards over ``data_axis`` when given, so
    DP x PP composes); the result is the (M, mb, ...) pipeline output,
    taken from the last stage. Differentiable end-to-end: `jax.grad` of a
    loss on the result yields stacked per-stage param grads with the same
    sharding.
    """
    from jax.sharding import PartitionSpec as P

    def f(stacked_params, xs):
        ys = pipeline_apply(
            stage_fn, stacked_params, xs, axis_name=pipe_axis
        )
        # only the last device's ys is the pipeline output: stack the
        # per-stage copies and let the caller-side slice pick stage -1
        return ys[None]

    g = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(None, data_axis)),
        out_specs=P(pipe_axis, None, data_axis),
        check_vma=False,
    )

    def run(stacked_params, xs):
        return g(stacked_params, xs)[-1]

    return run


def fusion_pipeline_encoder(block_fn: Callable, layer_params, mesh, *,
                            pipe_axis: str = "model",
                            data_axis: str = "data",
                            microbatches: int = None):
    """Pipeline a REAL transformer encoder (train.py --pipeline_parallel):
    the fusion model's ``mm_encoder`` resblocks run as a GPipe pipeline
    over ``pipe_axis``, each stage applying layers/P consecutive blocks.

    Args:
      block_fn: (one_layer_params, x) -> y applying ONE residual block
        (shape/dtype preserving — e.g. a flax ``.apply`` closure).
      layer_params: the per-layer param subtrees IN ORDER (taken live from
        the train step's params, so grads flow back to the original
        ``resblocks_i`` leaves through the stack/reshape below).
      microbatches: GPipe M (default: the stage count P; bubble fraction
        is (P-1)/(M+P-1)).

    Returns ``encode(x)`` mapping (B, S, D) -> (B, S, D).

    Storage note: params stay in their per-layer (replicated or
    DP-sharded) layout; the (P, L/P, ...) stacked view is built inside the
    step (a few MB of copies for reference-size encoders). Activation
    memory — the thing PP buys at depth — is per-stage.
    """
    n_stage = int(mesh.shape[pipe_axis])
    n_layers = len(layer_params)
    if n_layers % n_stage:
        raise ValueError(
            f"pipeline_parallel={n_stage} must divide the encoder depth "
            f"{n_layers}"
        )
    per = n_layers // n_stage
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *layer_params
    )
    stacked = jax.tree_util.tree_map(
        lambda l: l.reshape((n_stage, per) + l.shape[1:]), stacked
    )

    def stage_fn(stage_params, x):  # stage_params leaves: (per, ...)
        def body(h, lp):
            return block_fn(lp, h), None

        h, _ = jax.lax.scan(body, x, stage_params)
        return h

    from jax.sharding import PartitionSpec as P

    m = microbatches or n_stage

    # The microbatch split happens INSIDE the shard_map on each data
    # shard's LOCAL batch — a global (B,..)->(M,B/M,..) reshape across the
    # 'data'-sharded dim would cost an all-to-all per step (and deadlocked
    # XLA:CPU in the DPxPP train step); splitting locally is free and
    # row-wise equivalent.
    def f(stacked_params, xloc):
        bl = xloc.shape[0]
        if bl % m:  # unreachable via encode() below (it pads); safety net
            raise ValueError(
                f"per-data-shard batch {bl} must divide into {m} pipeline "
                "microbatches"
            )
        xs = xloc.reshape((m, bl // m) + tuple(xloc.shape[1:]))
        ys = pipeline_apply(stage_fn, stacked_params, xs,
                            axis_name=pipe_axis)
        return ys.reshape(xloc.shape)[None]

    g = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(data_axis)),
        out_specs=P(pipe_axis, data_axis),
        check_vma=False,
    )

    n_data = int(mesh.shape[data_axis]) if data_axis else 1

    def encode(x):
        # The loaders keep epoch remainders (drop_last=False parity) and
        # the val/test eval steps route through this same apply_fn, so the
        # batch need not divide data_shards * microbatches. Pad with zero
        # rows up to the next multiple and slice back: rows are independent
        # along the batch dim (per-row LN, batch-dim attention), so padding
        # is exact — same rationale as put_batch_fn's replicated fallback.
        b = x.shape[0]
        pad = (-b) % (n_data * m)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + tuple(x.shape[1:]), x.dtype)], axis=0
            )
        y = g(stacked, x)[-1]
        return y[:b] if pad else y

    return encode


def masked_pipeline_encoder(block_fn: Callable, layer_params, mesh, *,
                            pipe_axis: str = "model",
                            data_axis: str = "data",
                            microbatches: int = None):
    """Pipeline a MASKED transformer encoder (train.py --pipeline_parallel
    for the MMBT family): the BERT encoder's layers run as a GPipe
    pipeline over ``pipe_axis``, with the per-sample attention mask riding
    the microbatch stream as a second pytree leaf — each stage applies
    layers/P consecutive blocks and passes the mask through unchanged.

    Args:
      block_fn: (one_layer_params, x, key_mask) -> y applying ONE encoder
        layer (shape/dtype preserving in x; key_mask is (mb, S) bool).
      layer_params: the per-layer param subtrees IN ORDER (taken live from
        the train step's params, so grads flow back to the original
        ``layer_i`` leaves).
      microbatches: GPipe M (default: the stage count P).

    Returns ``encode(x, key_mask)`` mapping ((B, S, D), (B, S)) ->
    (B, S, D). Batches that divide neither the data axis nor M are padded
    with zero rows (mask rows all-False... see note below) and sliced
    back, exactly like ``fusion_pipeline_encoder``.
    """
    n_stage = int(mesh.shape[pipe_axis])
    n_layers = len(layer_params)
    if n_layers % n_stage:
        raise ValueError(
            f"pipeline_parallel={n_stage} must divide the encoder depth "
            f"{n_layers}"
        )
    per = n_layers // n_stage
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *layer_params
    )
    stacked = jax.tree_util.tree_map(
        lambda l: l.reshape((n_stage, per) + l.shape[1:]), stacked
    )

    def stage_fn(stage_params, inp):
        x, mask = inp

        def body(h, lp):
            return block_fn(lp, h, mask), None

        h, _ = jax.lax.scan(body, x, stage_params)
        return h, mask

    from jax.sharding import PartitionSpec as P

    m = microbatches or n_stage

    def f(stacked_params, xloc, mloc):
        bl = xloc.shape[0]
        if bl % m:  # unreachable via encode() below (it pads); safety net
            raise ValueError(
                f"per-data-shard batch {bl} must divide into {m} pipeline "
                "microbatches"
            )
        xs = xloc.reshape((m, bl // m) + tuple(xloc.shape[1:]))
        ms = mloc.reshape((m, bl // m) + tuple(mloc.shape[1:]))
        ys, _ = pipeline_apply(stage_fn, stacked_params, (xs, ms),
                               axis_name=pipe_axis)
        return ys.reshape(xloc.shape)[None]

    g = jax.shard_map(
        f,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(data_axis), P(data_axis)),
        out_specs=P(pipe_axis, data_axis),
        check_vma=False,
    )

    n_data = int(mesh.shape[data_axis]) if data_axis else 1

    def encode(x, key_mask):
        b = x.shape[0]
        pad = (-b) % (n_data * m)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + tuple(x.shape[1:]), x.dtype)], axis=0
            )
            # padded rows keep ONE visible position: a BERT softmax over an
            # all-masked row is 0/0 -> NaN, and although the rows are
            # sliced away, NaNs would poison the backward through the
            # shared dW reductions. One kept key makes them finite; the
            # rows are still discarded below.
            pad_mask = jnp.zeros((pad,) + tuple(key_mask.shape[1:]),
                                 key_mask.dtype)
            pad_mask = pad_mask.at[:, 0].set(True)
            key_mask = jnp.concatenate([key_mask, pad_mask], axis=0)
        y = g(stacked, x, key_mask)[-1]
        return y[:b] if pad else y

    return encode
