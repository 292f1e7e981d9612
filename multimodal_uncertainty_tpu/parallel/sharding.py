"""Sharding rules and state placement.

Design (How-to-Scale recipe): pick a mesh, annotate shardings on the state
and batch, let XLA insert collectives.

* **DP**: batch P('data', ...); params replicated -> grad psum over 'data'.
* **TP** (fusion/MIMO transformers, BERT/MMBT, AND ViLT): MLP and attention
  projections shard over 'model' in the megatron column->row pattern —
  column-parallel (kernel P(None,'model'), bias P('model')): CLIP-stack
  c_fc (D,4D) and packed qkv in_proj (D,3D); BERT query/key/value (D,D)
  and intermediate_dense (D,4D); ViLT qkv (D,3D) and fc1 (D,4D).
  Row-parallel (kernel P('model',None),
  bias replicated, added once after the reduce): CLIP c_proj/out_proj;
  BERT attn_output_dense/output_dense; ViLT proj/fc2. Activations stay
  P('data', None, None); XLA turns each pair into one psum per block.
  Embedding tables, LayerNorms, pooler, classifier heads and ResNet convs
  stay replicated (they are small next to the transformer blocks).
* **EP** (ensemble axis): the fused EnsembleHeads einsum (E, D, C) can shard
  E over 'model' when E is large; replicated by default (E<=4 here).
* **FSDP / ZeRO-3** (`fsdp=True`): every param additionally shards its
  largest still-free divisible dim over 'data', and the optimizer moments /
  accumulation buffers follow. XLA then materializes each weight only at its
  use site (all-gather riding ICI) and reduce-scatters gradients instead of
  all-reducing — per-chip param+moment memory drops ~|data|x, the classic
  ZeRO trade of one extra weight all-gather in the backward for the memory.
  The train step pins the UPDATED state to the same specs via
  ``with_sharding_constraint`` so the sharded layout is a fixed point of the
  step, not a propagation accident.
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
    # | ViLT ViT blocks (packed qkv like CLIP's in_proj; fc1 is the MLP up)
    {"in_proj", "c_fc", "query", "key", "value", "intermediate_dense",
     "qkv", "fc1"}
)
_ROW_PARALLEL = frozenset(
    {"out_proj", "c_proj", "attn_output_dense", "output_dense",
     "proj", "fc2"}  # ViLT attention-output / MLP-down
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


def fsdp_param_shardings(
    params: Any, mesh: Mesh, *, base_rules=transformer_tp_rules,
    axis: str = "data",
):
    """FSDP/ZeRO-3 placement: each param's LARGEST dim that (a) the base
    (TP) rules leave unsharded and (b) divides the data-axis size shards
    over `axis`. Params with no such dim (scalars, odd-width biases) stay
    on their base spec — GSPMD needs no special casing for the mix."""
    n = mesh.shape[axis]

    def assign(path, leaf):
        dims = getattr(leaf, "shape", ())
        spec = list(base_rules(_path_names(path), leaf))
        spec += [None] * (len(dims) - len(spec))
        # validate base axes (same divisibility rule as param_shardings)
        for i, ax in enumerate(spec):
            if ax is not None and not (
                i < len(dims) and dims[i] % mesh.shape[ax] == 0
                and dims[i] >= mesh.shape[ax]
            ):
                spec[i] = None
        free = [(d, i) for i, d in enumerate(dims)
                if spec[i] is None and d % n == 0 and d >= n]
        if free:
            # largest dim -> most even memory split; ties break on the
            # later dim (output features) for stable, layout-friendly specs
            _, i = max(free)
            spec[i] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map_with_path(assign, params)


def state_sharding_tree(state, mesh: Mesh, *, tp: bool = False,
                        fsdp: bool = False):
    """A TrainState-shaped tree of NamedShardings: the target placement for
    `shard_state` AND the in-step `with_sharding_constraint` that keeps the
    updated state on the same layout (FSDP's fixed point)."""
    rep = replicated(mesh)
    if fsdp:
        base = transformer_tp_rules if tp else (lambda names, leaf: P())
        p_sh = fsdp_param_shardings(state.params, mesh, base_rules=base)
    elif tp:
        p_sh = param_shardings(state.params, mesh)
    else:
        p_sh = jax.tree_util.tree_map(lambda _: rep, state.params)

    def like_params(tree):
        # optimizer moments share the params treedef; anything else replicates
        try:
            return jax.tree_util.tree_map(lambda _, s: s, tree, p_sh)
        except (ValueError, TypeError):
            return jax.tree_util.tree_map(lambda _: rep, tree)

    opt_sh = {}
    for k, v in state.opt_state.items():
        if k in ("mu", "nu", "momentum"):
            opt_sh[k] = like_params(v)
        else:
            opt_sh[k] = jax.tree_util.tree_map(lambda _: rep, v)
    return state.replace(
        params=p_sh,
        opt_state=opt_sh,
        batch_stats=(
            None if state.batch_stats is None
            else jax.tree_util.tree_map(lambda _: rep, state.batch_stats)
        ),
        step=rep,
        accum_grads=(
            None if state.accum_grads is None else like_params(state.accum_grads)
        ),
    )


def shard_state(state, mesh: Mesh, *, tp: bool = False, fsdp: bool = False):
    """Place a TrainState on the mesh: params (and mirrored optimizer
    moments) replicated, TP-sharded, and/or FSDP-sharded over 'data';
    scalars replicated."""
    if not tp and not fsdp:
        return jax.device_put(state, replicated(mesh))
    sh = state_sharding_tree(state, mesh, tp=tp, fsdp=fsdp)
    return jax.tree_util.tree_map(jax.device_put, state, sh)


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
