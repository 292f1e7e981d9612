"""Sharding rules and state placement.

Design (How-to-Scale recipe): pick a mesh, annotate shardings on the state
and batch, let XLA insert collectives.

* **DP**: batch P('data', ...); params replicated -> grad psum over 'data'.
* **TP** (fusion/MIMO transformers AND BERT/MMBT): MLP and attention
  projections shard over 'model' in the megatron column->row pattern —
  column-parallel (kernel P(None,'model'), bias P('model')): CLIP-stack
  c_fc (D,4D) and packed qkv in_proj (D,3D); BERT query/key/value (D,D)
  and intermediate_dense (D,4D). Row-parallel (kernel P('model',None),
  bias replicated, added once after the reduce): CLIP c_proj/out_proj;
  BERT attn_output_dense/output_dense. Activations stay
  P('data', None, None); XLA turns each pair into one psum per block.
  Embedding tables, LayerNorms, pooler, classifier heads and ResNet convs
  stay replicated (they are small next to the transformer blocks).
* **EP** (ensemble axis): the fused EnsembleHeads einsum (E, D, C) can shard
  E over 'model' when E is large; replicated by default (E<=4 here).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = None) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# Matched against the param's PARENT module name exactly (not substring:
# BERT's "attn_output_dense" contains "output_dense" — substring matching
# would misclassify the attention output projection as the MLP one).
_COLUMN_PARALLEL = frozenset(
    # CLIP stack (fusion / MIMO transformer)  |  BERT (MMBT path)
    {"in_proj", "c_fc", "query", "key", "value", "intermediate_dense"}
)
_ROW_PARALLEL = frozenset(
    {"out_proj", "c_proj", "attn_output_dense", "output_dense"}
)


def transformer_tp_rules(path_names, leaf) -> P:
    """PartitionSpec for one param given its path (tuple of str names)."""
    if len(path_names) < 2:
        return P()
    parent, name = path_names[-2], path_names[-1]
    if parent in _COLUMN_PARALLEL:
        if name == "kernel":
            return P(None, "model")
        if name == "bias":
            return P("model")
    if parent in _ROW_PARALLEL and name == "kernel":
        # bias stays replicated: in row-parallel layout it is added once
        # after XLA's psum, not per-shard
        return P("model", None)
    if parent == "output_layers":
        # EP: the fused EnsembleHeads einsum (E, D, C) shards its ensemble
        # axis over 'model' — each shard computes its own heads' logits
        # locally (batched per-head matmuls, no cross-head reduction).
        # param_shardings drops the axis automatically when E % mp != 0.
        if name == "kernel":
            return P("model", None, None)
        if name == "bias":
            return P("model", None)
    return P()


def _path_names(path) -> tuple:
    return tuple(
        p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
    )


def param_shardings(params: Any, mesh: Mesh, rules=transformer_tp_rules):
    def assign(path, leaf):
        spec = rules(_path_names(path), leaf)
        # Drop axes that don't divide the dim (e.g. bias of odd width).
        dims = getattr(leaf, "shape", ())
        clean = []
        for i, ax in enumerate(spec):
            if ax is None:
                clean.append(None)
                continue
            size = mesh.shape[ax]
            if i < len(dims) and dims[i] % size == 0 and dims[i] >= size:
                clean.append(ax)
            else:
                clean.append(None)
        return NamedSharding(mesh, P(*clean))

    return jax.tree_util.tree_map_with_path(assign, params)


def shard_state(state, mesh: Mesh, *, tp: bool = False):
    """Place a TrainState on the mesh: params (and mirrored optimizer
    moments) replicated or TP-sharded; scalars replicated."""
    rep = replicated(mesh)
    if not tp:
        return jax.device_put(state, rep)

    p_sh = param_shardings(state.params, mesh)
    new_params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)

    def put_like_params(tree):
        # optimizer moments share the params treedef; anything else replicates
        try:
            return jax.tree_util.tree_map(jax.device_put, tree, p_sh)
        except (ValueError, TypeError):
            return jax.device_put(tree, rep)

    opt_state = {}
    for k, v in state.opt_state.items():
        if k in ("mu", "nu", "momentum"):
            opt_state[k] = put_like_params(v)
        else:
            opt_state[k] = jax.device_put(v, rep)
    new = state.replace(params=new_params, opt_state=opt_state)
    if state.batch_stats is not None:
        new = new.replace(batch_stats=jax.device_put(state.batch_stats, rep))
    if state.accum_grads is not None:
        new = new.replace(accum_grads=put_like_params(state.accum_grads))
    return new


def put_batch_fn(mesh: Mesh):
    """Returns a Trainer put_batch_fn sharding every batch leaf over 'data'.

    The final partial batch of an epoch (loaders keep remainders,
    drop_last=False parity) may not divide the data-axis size; such batches
    are placed REPLICATED instead — exact results, the DP speedup is simply
    skipped for that one batch."""
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    n_data = mesh.shape["data"]

    def put(batch):
        leaves = jax.tree_util.tree_leaves(batch)
        divisible = all(
            getattr(a, "shape", (0,))[0] % n_data == 0 for a in leaves
        )
        target = sh if divisible else rep
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, target), batch
        )

    return put
