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
      stage_fn: (params, x) -> y with y.shape == x.shape (stages chain).
      stacked_params: pytree whose leaves carry this device's stage slice
        with a leading stage dim of 1 (the global leaves are (P, ...)
        sharded over ``axis_name``) — squeezed here.
      xs: (M, mb, ...) microbatch stream, replicated across the axis
        (only stage 0 reads it).

    Returns (M, mb, ...) last-stage outputs — valid on the LAST device;
    under the `pipeline_sharded` wrapper the caller slices stage -1 of the
    stacked result.
    """
    p = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    params = jax.tree_util.tree_map(lambda l: l[0], stacked_params)
    m = xs.shape[0]
    fwd_perm = [(i, i + 1) for i in range(n - 1)]  # non-cyclic: 0 gets zeros

    def step(carry, t):
        recv, ys = carry
        x_t = jax.lax.dynamic_index_in_dim(
            xs, jnp.clip(t, 0, m - 1), keepdims=False
        )
        inp = jnp.where(p == 0, x_t, recv)
        out = stage_fn(params, inp)
        if out.shape != inp.shape or out.dtype != inp.dtype:
            raise TypeError(
                "pipeline stage_fn must preserve shape AND dtype so stages "
                f"chain: got {inp.shape}/{inp.dtype} -> "
                f"{out.shape}/{out.dtype}"
            )
        # last stage lands microbatch t-(n-1) at tick t (predicated write)
        idx = jnp.clip(t - (n - 1), 0, m - 1)
        cur = jax.lax.dynamic_index_in_dim(ys, idx, keepdims=False)
        row = jnp.where(t >= n - 1, out, cur)
        ys = jax.lax.dynamic_update_index_in_dim(ys, row, idx, 0)
        recv = jax.lax.ppermute(out, axis_name, fwd_perm)
        return (recv, ys), None

    recv0 = jnp.zeros(xs.shape[1:], xs.dtype)
    ys0 = jnp.zeros_like(xs)
    (_, ys), _ = jax.lax.scan(step, (recv0, ys0), jnp.arange(m + n - 1))
    return ys


def pipeline_sharded(stage_fn: Callable, mesh, *, pipe_axis: str = "model"):
    """shard_map-wrapped pipeline: returns fn(stacked_params, xs) -> ys.

    ``stacked_params`` leaves are GLOBAL (P, ...) arrays sharded over
    ``pipe_axis`` (stage p's slice on device p); ``xs`` is the global
    (M, mb, ...) microbatch stream (replicated); the result is the
    (M, mb, ...) pipeline output, taken from the last stage and
    replicated. Differentiable end-to-end: `jax.grad` of a loss on the
    result yields stacked per-stage param grads with the same sharding.
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
        in_specs=(P(pipe_axis), P()),
        out_specs=P(pipe_axis),
        check_vma=False,
    )

    def run(stacked_params, xs):
        return g(stacked_params, xs)[-1]

    return run
