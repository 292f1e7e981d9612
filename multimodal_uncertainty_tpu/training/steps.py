"""Jitted train/eval step builders.

Everything per-batch — MIMO data forming, forward, loss, backward, optimizer,
metrics — compiles into ONE XLA program (the reference ran the data transforms
on CPU and synced per batch, ``src/framework.py:262-319``). Steps are built
against a :class:`ModelBundle` and an :class:`Optimizer` and jitted with
donated state; when a mesh is provided the batch is sharded over the 'data'
axis and XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from multimodal_uncertainty_tpu.training.optim import Optimizer
from multimodal_uncertainty_tpu.training.state import TrainState


@dataclasses.dataclass(frozen=True)
class ModelBundle:
    """Uniform adapter between a model family and the trainer.

    apply_fn(variables, x, *, train, rngs, mutable) -> (logits, mutated_vars)
    loss_fn(logits, y, eval) -> scalar
    data_forming(key, x, y, phase) -> (x, y)  (None = identity)
    metric_fns: list of (name, fn(logits, y, eval)) computed on-device.
    grad_mask_fn(grads, flags) -> grads  (optional; e.g. MMBT freezing)
    """

    apply_fn: Callable
    loss_fn: Callable
    data_forming: Optional[Callable] = None
    metric_fns: Sequence = ()
    grad_mask_fn: Optional[Callable] = None
    eval_pred_fn: Optional[Callable] = None  # logits -> per-sample eval preds
    diversity_kind: str = "none"  # guided/random ensemble-diversity signal
    diversity_coef: float = 0.0


def build_train_step(
    bundle: ModelBundle,
    optimizer: Optimizer,
    *,
    gradient_accumulation_steps: int = 1,
    donate: bool = True,
    state_shardings=None,
):
    """`state_shardings` (a TrainState-shaped tree of NamedShardings, from
    `parallel.sharding.state_sharding_tree`) pins the UPDATED state to the
    given placement — required for FSDP, where the sharded param layout must
    be a fixed point of the step rather than a GSPMD propagation choice."""
    accum = gradient_accumulation_steps

    def step(state: TrainState, x, y, key, flags=None):
        k_form, k_drop, k_div = jax.random.split(key, 3)
        if bundle.data_forming is not None:
            x, y = bundle.data_forming(k_form, x, y, "train")

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            logits, mutated = bundle.apply_fn(
                variables, x, train=True, rngs={"dropout": k_drop}
            )
            loss = bundle.loss_fn(logits, y, eval=False)
            if bundle.diversity_kind != "none" and logits.ndim == 3:
                from multimodal_uncertainty_tpu.ops.diversity import apply_diversity

                loss = apply_diversity(
                    loss, logits, y, k_div,
                    kind=bundle.diversity_kind, coef=bundle.diversity_coef,
                )
            return loss, (logits, mutated)

        (loss, (logits, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        freeze_mask_fn = None
        opt_active = None
        if bundle.grad_mask_fn is not None and flags is not None:
            grads = bundle.grad_mask_fn(grads, flags)
            freeze_mask_fn = bundle.grad_mask_fn
            if optimizer.supports_active:
                # per-leaf 1/0 trainability: frozen leaves must be skipped
                # INSIDE the optimizer too (no moment/step advance — exact
                # BertAdam `p.grad is None: continue` semantics)
                ones = jax.tree_util.tree_map(
                    lambda _: jnp.ones((), jnp.float32), state.params
                )
                opt_active = freeze_mask_fn(ones, flags)

        new_batch_stats = (
            mutated.get("batch_stats") if isinstance(mutated, dict) else None
        )
        if new_batch_stats is None:
            new_batch_stats = state.batch_stats

        if accum > 1:
            # TRUE gradient accumulation: micro-batch grads (each scaled by
            # 1/accum like the reference's loss division) are summed and
            # applied every `accum` steps. NOTE this intentionally fixes a
            # reference bug: src/framework.py:281,288 calls zero_grad()
            # before EVERY micro-batch, so the reference's step applies only
            # the LAST micro-batch's grad/accum (see DEVIATIONS.md).
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            acc_grads = jax.tree_util.tree_map(
                jnp.add, state.accum_grads, grads
            )
            micro = state.step + 1
            do_apply = (micro % accum) == 0

            def apply_branch(operand):
                acc_grads, params, opt_state = operand
                if opt_active is None:
                    updates, new_opt = optimizer.update(
                        acc_grads, opt_state, params
                    )
                else:
                    updates, new_opt = optimizer.update(
                        acc_grads, opt_state, params, opt_active
                    )
                if freeze_mask_fn is not None:
                    updates = freeze_mask_fn(updates, flags)
                new_params = jax.tree_util.tree_map(jnp.add, params, updates)
                zeros = jax.tree_util.tree_map(jnp.zeros_like, acc_grads)
                return new_params, new_opt, zeros

            def skip_branch(operand):
                acc_grads, params, opt_state = operand
                return params, opt_state, acc_grads

            new_params, new_opt, new_accum = jax.lax.cond(
                do_apply, apply_branch, skip_branch,
                (acc_grads, state.params, state.opt_state),
            )
            loss_reported = loss / accum
        else:
            if opt_active is None:
                updates, new_opt = optimizer.update(
                    grads, state.opt_state, state.params
                )
            else:
                updates, new_opt = optimizer.update(
                    grads, state.opt_state, state.params, opt_active
                )
            if freeze_mask_fn is not None:
                # Frozen subtrees must stay bit-unchanged: torch skips
                # grad-less params entirely, so mask weight-decay/momentum
                # residuals out of the UPDATE too, not just the grads.
                updates = freeze_mask_fn(updates, flags)
            new_params = jax.tree_util.tree_map(jnp.add, state.params, updates)
            new_accum = state.accum_grads
            loss_reported = loss

        metrics = {
            name: fn(logits, y, eval=False) for name, fn in bundle.metric_fns
        }
        new_state = TrainState(
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_batch_stats,
            step=state.step + 1,
            accum_grads=new_accum,
        )
        if state_shardings is not None:
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings
            )
        return new_state, {"loss": loss_reported, **metrics}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_eval_step(bundle: ModelBundle):
    def step(state: TrainState, x, y):
        if bundle.data_forming is not None:
            # Eval transforms are deterministic (every strategy is identity
            # or key-free at phase='eval', reference src/dataset.py:30-101),
            # but pass a real key so a future keyed eval transform gets a
            # defined stream instead of a None crash.
            x, y = bundle.data_forming(jax.random.key(0), x, y, "eval")
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits, _ = bundle.apply_fn(variables, x, train=False, rngs=None)
        loss = bundle.loss_fn(logits, y, eval=True)
        metrics = {name: fn(logits, y, eval=True) for name, fn in bundle.metric_fns}
        if bundle.eval_pred_fn is not None:
            preds = bundle.eval_pred_fn(logits)
        elif logits.ndim == 3:
            preds = logits.mean(axis=1)  # head-mean (src/framework.py:191)
        else:
            preds = logits
        return {"loss": loss, **metrics}, preds, y

    return jax.jit(step)
