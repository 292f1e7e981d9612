"""Optimizers and LR schedules (pure-pytree, jit-native).

The reference uses four optimizer configurations:

* SGD + momentum + weight decay for the FashionMNIST MIMO ResNet
  (``train_fashionmnist.py:113-116``)
* BertAdam (no bias correction, per-parameter grad-norm clipping,
  warmup-linear schedule, grouped weight decay) for the MIMO transformer and
  MMBT (``train_fashionmnist.py:100-105``, ``train.py:142-147``)
* torch AdamW + HF cosine-warmup schedule for the FLAVA fusion models
  (``train.py:196-208``)
* ReduceLROnPlateau stepping per-epoch on a monitored metric
  (``src/framework.py:339-340``)

All are re-implemented here natively so the semantics (esp. BertAdam's
non-standard ones) are exact. Each optimizer is a pair of pure functions and
the whole opt state is one pytree, so the update runs inside the jitted,
sharded train step. The per-step LR is ``schedule(step) * lr_scale`` where
``lr_scale`` lives *inside* the opt state: the host-side plateau scheduler
mutates it between epochs without recompilation.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Optimizer(NamedTuple):
    init: Callable[[Any], dict]
    # update(grads, opt_state, params[, active]) -> (param_updates, new_opt_state)
    update: Callable[[Any, dict, Any], tuple]
    # True if `update` takes a 4th arg: a params-shaped pytree of 0/1 scalars
    # marking which leaves are trainable this step (frozen leaves must be
    # skipped entirely — torch's `if p.grad is None: continue`)
    supports_active: bool = False


def _tree_zeros_like(tree):
    return jax.tree_util.tree_map(jnp.zeros_like, tree)


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


def constant_schedule(lr: float) -> Callable:
    return lambda step: jnp.asarray(lr, jnp.float32)


def warmup_linear_schedule(lr: float, warmup: float, t_total: float) -> Callable:
    """BertAdam's ``warmup_linear``: x/warmup below warmup, else 1 - x.

    (Goes negative past t_total — a known BertAdam quirk, preserved.)
    """

    def fn(step):
        x = step.astype(jnp.float32) / t_total
        return lr * jnp.where(x < warmup, x / jnp.maximum(warmup, 1e-12), 1.0 - x)

    return fn


def cosine_warmup_schedule(lr: float, warmup_steps: int, total_steps: int) -> Callable:
    """HF ``get_cosine_schedule_with_warmup`` (num_cycles=0.5)."""

    def fn(step):
        s = step.astype(jnp.float32)
        warm = s / jnp.maximum(1.0, warmup_steps)
        progress = (s - warmup_steps) / jnp.maximum(1.0, total_steps - warmup_steps)
        decay = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * progress)))
        return lr * jnp.where(s < warmup_steps, warm, decay)

    return fn


# ---------------------------------------------------------------------------
# Weight-decay masks
# ---------------------------------------------------------------------------


def no_decay_mask(params) -> Any:
    """True where weight decay APPLIES, replicating the reference's torch
    name-based grouping ``no_decay = ["bias", "LayerNorm.bias",
    "LayerNorm.weight"]`` (``train.py:137-141``) exactly:

    * any leaf named ``bias`` is excluded;
    * params of modules whose torch name contains ``LayerNorm`` are excluded
      — here that's the BertLayerNorm modules (named ``*LayerNorm``) and the
      MMBT shared embedding LN leaves (``ln_weight``/``ln_bias``);
    * everything else decays — INCLUDING the CLIP-style ``ln_pre``/``ln_1``
      scales and BatchNorm scales, because their torch names
      (``ln_pre.weight``, ``bn1.weight``) do not contain "LayerNorm" and the
      reference therefore decays them.
    """

    def decide(path) -> bool:
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        leaf = names[-1] if names else ""
        parents = "/".join(names[:-1]).lower()
        if leaf in ("bias", "ln_bias"):
            return False
        if leaf == "ln_weight":
            return False
        if "layernorm" in parents and leaf in ("weight", "scale"):
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


# ---------------------------------------------------------------------------
# SGD (torch semantics: wd folded into grad, then momentum buffer)
# ---------------------------------------------------------------------------


def sgd(
    schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
) -> Optimizer:
    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "momentum": _tree_zeros_like(params),
            "lr_scale": jnp.ones((), jnp.float32),
        }

    def update(grads, state, params):
        lr = schedule(state["step"]) * state["lr_scale"]

        def upd(g, p, buf):
            g = g + weight_decay * p
            buf = momentum * buf + g
            return -lr * buf, buf

        out = jax.tree_util.tree_map(upd, grads, params, state["momentum"])
        updates = jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=lambda x: isinstance(x, tuple))
        bufs = jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=lambda x: isinstance(x, tuple))
        return updates, {
            "step": state["step"] + 1,
            "momentum": bufs,
            "lr_scale": state["lr_scale"],
        }

    return Optimizer(init, update)


# ---------------------------------------------------------------------------
# AdamW (torch semantics: decoupled wd, bias correction)
# ---------------------------------------------------------------------------


def adamw(
    schedule: Callable,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> Optimizer:
    def init(params):
        return {
            "step": jnp.zeros((), jnp.int32),
            "mu": _tree_zeros_like(params),
            "nu": _tree_zeros_like(params),
            "lr_scale": jnp.ones((), jnp.float32),
        }

    def update(grads, state, params):
        step = state["step"] + 1
        lr = schedule(state["step"]) * state["lr_scale"]
        c1 = 1.0 - b1 ** step.astype(jnp.float32)
        c2 = 1.0 - b2 ** step.astype(jnp.float32)

        def upd(g, p, m, v):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mhat = m / c1
            vhat = v / c2
            delta = -lr * (mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p)
            return delta, m, v

        out = jax.tree_util.tree_map(upd, grads, params, state["mu"], state["nu"])
        leaf = lambda x: isinstance(x, tuple)  # noqa: E731
        return (
            jax.tree_util.tree_map(lambda o: o[0], out, is_leaf=leaf),
            {
                "step": step,
                "mu": jax.tree_util.tree_map(lambda o: o[1], out, is_leaf=leaf),
                "nu": jax.tree_util.tree_map(lambda o: o[2], out, is_leaf=leaf),
                "lr_scale": state["lr_scale"],
            },
        )

    return Optimizer(init, update)


# ---------------------------------------------------------------------------
# BertAdam (pytorch_pretrained_bert semantics, exactly)
# ---------------------------------------------------------------------------


def bert_adam(
    lr: float,
    warmup: float,
    t_total: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
    decay_mask: Optional[Any] = None,
) -> Optimizer:
    """BertAdam: per-parameter grad clipping, NO bias correction,
    weight decay added into the update, warmup-linear schedule.

    ``decay_mask`` is a pytree of bools (True = apply weight decay); defaults
    to :func:`no_decay_mask` of the params at init.

    ``step`` is a PER-LEAF counter tree: pytorch_pretrained_bert's BertAdam
    keeps ``state['step']`` per parameter and skips grad-less params
    entirely (``if p.grad is None: continue``), so when the reference
    freezes ``enc.img_encoder``/``enc.encoder`` for the first
    freeze_img/freeze_txt epochs (``src/framework.py:280-285``), the frozen
    subtree's warmup-linear schedule LAGS the live ones after unfreezing.
    ``update(..., active)`` reproduces that: an ``active=0`` leaf gets no
    param update, no moment update, and no step advance.
    """
    schedule = warmup_linear_schedule(lr, warmup, t_total)

    def init(params):
        mask = decay_mask if decay_mask is not None else no_decay_mask(params)
        return {
            "step": jax.tree_util.tree_map(
                lambda _: jnp.zeros((), jnp.int32), params
            ),
            "mu": _tree_zeros_like(params),
            "nu": _tree_zeros_like(params),
            "lr_scale": jnp.ones((), jnp.float32),
            "decay_mask": jax.tree_util.tree_map(lambda m: np.asarray(m), mask),
        }

    def update(grads, state, params, active=None):
        if active is None:
            active = jax.tree_util.tree_map(
                lambda _: jnp.ones((), jnp.float32), grads
            )
        lr_scale = state["lr_scale"]

        def upd(g, p, m, v, decay, step, a):
            if max_grad_norm > 0:
                gnorm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2))
                g = g * jnp.minimum(1.0, max_grad_norm / jnp.maximum(gnorm, 1e-12))
            m_new = b1 * m + (1 - b1) * g
            v_new = b2 * v + (1 - b2) * g * g
            upd_ = m_new / (jnp.sqrt(v_new) + eps)
            if weight_decay > 0:
                upd_ = upd_ + jnp.where(decay, weight_decay, 0.0) * p
            # BertAdam uses the pre-increment per-param step in the schedule
            lr_t = schedule(step) * lr_scale
            keep = a > 0
            return (
                -lr_t * a.astype(upd_.dtype) * upd_,
                jnp.where(keep, m_new, m),
                jnp.where(keep, v_new, v),
                step + a.astype(jnp.int32),
            )

        out = jax.tree_util.tree_map(
            upd, grads, params, state["mu"], state["nu"],
            state["decay_mask"], state["step"], active,
        )
        leaf = lambda x: isinstance(x, tuple)  # noqa: E731
        pick = lambda i: jax.tree_util.tree_map(  # noqa: E731
            lambda o: o[i], out, is_leaf=leaf
        )
        return (
            pick(0),
            {
                "step": pick(3),
                "mu": pick(1),
                "nu": pick(2),
                "lr_scale": lr_scale,
                "decay_mask": state["decay_mask"],
            },
        )

    return Optimizer(init, update, supports_active=True)


# ---------------------------------------------------------------------------
# ReduceLROnPlateau (host-side; mutates lr_scale in the opt state)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau semantics.

    Call :meth:`step` with the monitored value each epoch; read
    :attr:`scale` and write it into ``opt_state['lr_scale']``.
    """

    mode: str = "min"
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    min_lr: float = 0.0
    base_lr: float = 1.0
    eps: float = 1e-8

    scale: float = 1.0
    best: float = None  # type: ignore[assignment]
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def __post_init__(self):
        self.best = float("inf") if self.mode == "min" else float("-inf")

    def _is_better(self, a: float, best: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < best * (1.0 - self.threshold)
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (1.0 + self.threshold)
        return a > best + self.threshold

    def step(self, metric: float) -> float:
        current = float(metric)
        if self._is_better(current, self.best):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            old_lr = self.scale * self.base_lr
            new_lr = max(old_lr * self.factor, self.min_lr)
            if old_lr - new_lr > self.eps:
                self.scale = new_lr / self.base_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> dict:
        return {
            k: getattr(self, k)
            for k in ("scale", "best", "num_bad_epochs", "cooldown_counter")
        }

    def load_state_dict(self, sd: dict) -> None:
        for k, v in sd.items():
            setattr(self, k, v)
