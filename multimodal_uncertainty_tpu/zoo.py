"""Model-family setup: model + ModelBundle + optimizer + initial TrainState.

Mirrors the reference's per-framework setup functions
(``train.py:132-218`` setup_mmbt/setup_vilt/setup_flava and the
``train_fashionmnist.py`` __main__ body) as composable factories used by the
CLI scripts, tests and benches.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_uncertainty_tpu.models import (
    FlavaFusionTransformer,
    MIMOResNet,
    MIMOTransformer,
    model_configure,
)
from multimodal_uncertainty_tpu.ops.data_forming import (
    data_forming_func,
    data_forming_func_transformer,
)
from multimodal_uncertainty_tpu.ops.metrics import accuracy
from multimodal_uncertainty_tpu.training.optim import (
    ReduceLROnPlateau,
    adamw,
    bert_adam,
    constant_schedule,
    cosine_warmup_schedule,
    sgd,
)
from multimodal_uncertainty_tpu.training.state import TrainState
from multimodal_uncertainty_tpu.training.steps import ModelBundle


@dataclasses.dataclass
class Setup:
    model: Any
    bundle: ModelBundle
    optimizer: Any
    state: TrainState
    plateau: Optional[ReduceLROnPlateau]
    scheduler_step_on: str
    scheduler_metric: Optional[str]
    size_fn: Any = None


def _flax_apply_fn(model, has_batch_stats: bool):
    def apply_fn(variables, x, *, train, rngs):
        if train and has_batch_stats:
            return model.apply(
                variables, x, train=train, rngs=rngs, mutable=["batch_stats"]
            )
        return model.apply(variables, x, train=train, rngs=rngs), {}

    return apply_fn


def _init_state(model, optimizer, sample_x, key, *, accum: int = 1) -> TrainState:
    variables = model.init({"params": key}, sample_x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    opt_state = optimizer.init(params)
    accum_grads = (
        jax.tree_util.tree_map(jnp.zeros_like, params) if accum > 1 else None
    )
    return TrainState(
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        step=jnp.zeros((), jnp.int32),
        accum_grads=accum_grads,
    )


# ---------------------------------------------------------------------------
# FashionMNIST MIMO (reference train_fashionmnist.py)
# ---------------------------------------------------------------------------


def setup_fashionmnist(
    *,
    model_type: str = "Vanilla",
    transformer: bool = False,
    lr: float = 0.1,
    wd: float = 0.001,
    momentum: float = 0.9,
    warmup: float = 0.1,
    total_steps: Optional[int] = None,
    multimodal_num_attention_heads: int = 3,
    multimodal_num_hidden_layers: int = 3,
    dropout: float = 0.0,
    lr_patience: int = 10,
    seed_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    dtype=jnp.float32,
) -> Setup:
    emb_dim, out_dim = model_configure[model_type]
    key = seed_key if seed_key is not None else jax.random.key(0)

    if transformer:
        assert model_type in ("MultiHead", "MIMO-shuffle-instance")
        model = MIMOTransformer(
            out_dim=out_dim,
            num_classes=10,
            image_dim=14 * 14,
            hidden_size=768,
            multimodal_num_attention_heads=multimodal_num_attention_heads,
            multimodal_num_hidden_layers=multimodal_num_hidden_layers,
            drop=dropout,
            attn_impl=attn_impl,
            dtype=dtype,
        )
        optimizer = bert_adam(lr, warmup, float(total_steps or 1))
        plateau = ReduceLROnPlateau(mode="max", patience=10, factor=0.5)
        scheduler_metric = "val_acc"
        sample_x = jnp.zeros((2, emb_dim, 1, 14, 14), jnp.float32)
    else:
        model = MIMOResNet(
            num_channels=1,
            emb_dim=emb_dim,
            out_dim=out_dim,
            num_classes=10,
            dtype=dtype,
        )
        optimizer = sgd(constant_schedule(lr), momentum=momentum, weight_decay=wd)
        plateau = ReduceLROnPlateau(
            mode="min", factor=0.1, patience=lr_patience, threshold=1e-4
        )
        scheduler_metric = "val_loss"
        if model_type == "single-model-weight-sharing":
            sample_x = jnp.zeros((2, 1, 14, 14), jnp.float32)
        else:
            sample_x = jnp.zeros((2, 4, 1, 14, 14), jnp.float32)

    bundle = ModelBundle(
        apply_fn=_flax_apply_fn(model, has_batch_stats=not transformer),
        loss_fn=model.compute_loss,
        data_forming=lambda k, x, y, phase: data_forming_func(
            k, x, y, phase=phase, model_type=model_type
        ),
        metric_fns=(("acc", partial(accuracy, dummy_dim=True)),),
    )
    state = _init_state(model, optimizer, sample_x, key)
    m = 4
    size_fn = (
        (lambda x, y: len(y) * m)
        if model_type == "single-model-weight-sharing"
        else (lambda x, y: len(y))
    )
    return Setup(
        model, bundle, optimizer, state, plateau, "epoch", scheduler_metric, size_fn
    )


# ---------------------------------------------------------------------------
# FLAVA fusion (reference setup_flava, train.py:184-218)
# ---------------------------------------------------------------------------


def setup_flava(
    *,
    model_type: str = "Vanilla",
    n_classes: int = 2,
    lr: float = 1e-4,
    wd: float = 0.001,
    n_epochs: int = 100,
    steps_per_epoch: int = 100,
    multimodal_num_attention_heads: int = 3,
    multimodal_num_hidden_layers: int = 3,
    dropout: float = 0.0,
    clstoken: bool = False,
    avg_pool: bool = False,
    sample_shapes: Tuple[Tuple[int, int], Tuple[int, int]] = ((8, 197), (8, 77)),
    image_hidden_size: int = 768,
    text_hidden_size: int = 768,
    seed_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    dtype=jnp.float32,
) -> Setup:
    out_dim = 1 if model_type == "Vanilla" else 2
    key = seed_key if seed_key is not None else jax.random.key(0)

    model = FlavaFusionTransformer(
        out_dim=out_dim,
        num_classes=n_classes,
        image_hidden_size=image_hidden_size,
        text_hidden_size=text_hidden_size,
        multimodal_num_attention_heads=multimodal_num_attention_heads,
        multimodal_num_hidden_layers=multimodal_num_hidden_layers,
        drop=dropout if not clstoken else (dropout or 0.1),
        avg_pool=avg_pool,
        cls_token=clstoken,
        attn_impl=attn_impl,
        dtype=dtype,
    )
    # AdamW betas (0.9, 0.98), eps 1e-9 + HF cosine warmup over 3 epochs
    # (train.py:196-208).
    schedule = cosine_warmup_schedule(
        lr, warmup_steps=steps_per_epoch * 3, total_steps=steps_per_epoch * n_epochs
    )
    optimizer = adamw(schedule, b1=0.9, b2=0.98, eps=1e-9, weight_decay=wd)

    (b, li), (_, lt) = sample_shapes
    sample_x = (
        jnp.zeros((b, li, image_hidden_size), jnp.float32),
        jnp.zeros((b, lt, text_hidden_size), jnp.float32),
    )
    bundle = ModelBundle(
        apply_fn=_flax_apply_fn(model, has_batch_stats=False),
        loss_fn=model.compute_loss,
        data_forming=lambda k, x, y, phase: data_forming_func_transformer(
            k, x, y, phase=phase, model_type=model_type
        ),
        metric_fns=(("acc", partial(accuracy, dummy_dim=True)),),
    )
    state = _init_state(model, optimizer, sample_x, key)
    return Setup(model, bundle, optimizer, state, None, "batch", None)
