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


def _flax_apply_fn(model, has_batch_stats: bool, fast_dw=False):
    """fast_dw: False | True | "interpret" — when truthy, TRAIN-mode Linears
    route their weight gradient through the Pallas dW kernel (ops/dw.py);
    eval/forward paths are unchanged (no backward to accelerate)."""
    from multimodal_uncertainty_tpu.ops.dw import pallas_dw

    def apply_fn(variables, x, *, train, rngs):
        with pallas_dw(fast_dw if train else False):
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
    diversity: str = "none",
    diversity_coef: float = 0.0,
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
        diversity_kind=diversity,
        diversity_coef=diversity_coef,
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
    diversity: str = "none",
    diversity_coef: float = 0.0,
    seed_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    remat: bool = False,
    dtype=jnp.float32,
    fast_dw=False,
    pipeline_parallel: int = 1,
    pipeline_mesh=None,
    pipeline_microbatches: Optional[int] = None,
) -> Setup:
    out_dim = 1 if model_type == "Vanilla" else 2
    key = seed_key if seed_key is not None else jax.random.key(0)

    if pipeline_parallel > 1 and dropout:
        raise ValueError(
            "--pipeline_parallel requires dropout=0: the pipelined encoder "
            "stages run mask/rng-free (train.py --pipeline_parallel)"
        )

    model = FlavaFusionTransformer(
        out_dim=out_dim,
        num_classes=n_classes,
        image_hidden_size=image_hidden_size,
        text_hidden_size=text_hidden_size,
        multimodal_num_attention_heads=multimodal_num_attention_heads,
        multimodal_num_hidden_layers=multimodal_num_hidden_layers,
        # the reference passes args.dropout explicitly for BOTH classes
        # (train.py:188-194), so the CLS variant's class default 0.1 never
        # applies there either
        drop=dropout,
        avg_pool=avg_pool,
        cls_token=clstoken,
        attn_impl=attn_impl,
        remat=remat,
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
    if pipeline_parallel > 1:
        apply_fn = _pipelined_fusion_apply_fn(
            model, pipeline_mesh, pipeline_parallel,
            microbatches=pipeline_microbatches,
        )
    else:
        apply_fn = _flax_apply_fn(model, has_batch_stats=False,
                                  fast_dw=fast_dw)
    bundle = ModelBundle(
        apply_fn=apply_fn,
        loss_fn=model.compute_loss,
        data_forming=lambda k, x, y, phase: data_forming_func_transformer(
            k, x, y, phase=phase, model_type=model_type
        ),
        metric_fns=(("acc", partial(accuracy, dummy_dim=True)),),
        diversity_kind=diversity,
        diversity_coef=diversity_coef,
    )
    state = _init_state(model, optimizer, sample_x, key)
    return Setup(model, bundle, optimizer, state, None, "batch", None)


def _pipelined_fusion_apply_fn(model, mesh, n_stages: int, *,
                               microbatches: Optional[int] = None):
    """apply_fn running the fusion mm_encoder as a GPipe pipeline over the
    mesh's 'model' axis (train.py --pipeline_parallel; VERDICT r4 #5).

    The override reads the live ``resblocks_i`` params each call, so
    gradients flow back to the canonical per-layer leaves and the
    optimizer/checkpoint layout is unchanged. Eval paths with ablation
    masks are NOT pipelined (masks stay on the inline encoder)."""
    from multimodal_uncertainty_tpu.models.transformer import (
        ResidualAttentionBlock,
    )
    from multimodal_uncertainty_tpu.parallel.pipeline import (
        fusion_pipeline_encoder,
    )

    if mesh is None:
        raise ValueError("pipeline_parallel > 1 requires pipeline_mesh")
    block = ResidualAttentionBlock(
        model.multimodal_num_attention_heads, 0.0, model.attn_impl
    )
    n_layers = model.multimodal_num_hidden_layers

    def apply_fn(variables, x, *, train, rngs):
        enc = variables["params"]["mm_encoder"]
        layer_params = [enc[f"resblocks_{i}"] for i in range(n_layers)]
        encode = fusion_pipeline_encoder(
            lambda lp, h: block.apply({"params": lp}, h, False, None),
            layer_params, mesh, microbatches=microbatches,
        )

        def override(mm_x, mask):
            if mask is not None:
                raise ValueError(
                    "pipelined encoder supports unmasked batches only "
                    "(training path); run ablation evals without "
                    "--pipeline_parallel"
                )
            return encode(mm_x)

        piped = model.clone(encoder_override=override)
        return piped.apply(variables, x, train=train, rngs=rngs), {}

    return apply_fn


# ---------------------------------------------------------------------------
# MMBT (reference setup_mmbt, train.py:132-162)
# ---------------------------------------------------------------------------


def setup_mmbt(
    *,
    n_classes: int,
    lr: float = 5e-5,
    warmup: float = 0.1,
    total_steps: float = 1000.0,
    lr_patience: int = 2,
    lr_factor: float = 0.5,
    num_image_embeds: int = 3,
    bert_config=None,
    resnet_layers=(3, 8, 36, 3),
    img_embed_pool_type: str = "avg",
    dropout: float = 0.1,
    gradient_accumulation_steps: int = 40,
    vocab_size: Optional[int] = None,
    image_size: int = 224,
    sample_txt_len: int = 16,
    modality: str = "both",  # both | image | text (unimodal baselines)
    seed_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    dtype=None,
    remat: bool = False,
    fast_dw=False,
    pretrained_bert_sd=None,
    pretrained_resnet_sd=None,
    pipeline_parallel: int = 1,
    pipeline_mesh=None,
    pipeline_microbatches: Optional[int] = None,
) -> Setup:
    from multimodal_uncertainty_tpu.data.images import (
        FOOD101_MEAN,
        FOOD101_STD,
        normalize_on_device,
    )
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.models.mmbt import (
        MultimodalBertClf,
        mmbt_grad_mask_fn,
    )

    cfg = bert_config or BertConfig.base()
    if vocab_size is not None and vocab_size != cfg.vocab_size:
        cfg = dataclasses.replace(cfg, vocab_size=vocab_size)
    key = seed_key if seed_key is not None else jax.random.key(0)

    if pipeline_parallel > 1:
        if pipeline_mesh is None:
            raise ValueError("pipeline_parallel > 1 requires pipeline_mesh")
        if (dropout or cfg.hidden_dropout_prob
                or cfg.attention_probs_dropout_prob):
            raise ValueError(
                "pipeline_parallel > 1 requires every dropout rate = 0: "
                "the pipelined BERT stages run rng-free (train.py "
                "--pipeline_parallel zeroes them under --dropout 0)"
            )

    model = MultimodalBertClf(
        config=cfg,
        n_classes=n_classes,
        num_image_embeds=num_image_embeds,
        img_embed_pool_type=img_embed_pool_type,
        dropout=dropout,
        resnet_layers=tuple(resnet_layers),
        attn_impl=attn_impl,
        dtype=dtype,
        remat=remat,
    )
    optimizer = bert_adam(lr, warmup, float(total_steps))
    plateau = ReduceLROnPlateau(mode="max", patience=lr_patience, factor=lr_factor)

    base_apply = _flax_apply_fn(model, has_batch_stats=True)
    n_img_tok = num_image_embeds + 2

    def _modality_mask(bsz, txt_len):
        if modality == "image":
            return jnp.concatenate(
                [jnp.ones((bsz, n_img_tok), bool), jnp.zeros((bsz, txt_len), bool)],
                axis=1,
            )
        if modality == "text":  # keep CLS only from the image segment
            return jnp.concatenate(
                [jnp.ones((bsz, 1), bool), jnp.zeros((bsz, n_img_tok - 1), bool),
                 jnp.ones((bsz, txt_len), bool)],
                axis=1,
            )
        return None

    def _piped_model(variables):
        """MMBT leg of train.py --pipeline_parallel: the BERT encoder's
        layer_i stack runs as a GPipe pipeline over the mesh's 'model'
        axis, the per-sample attention mask riding the microbatch stream
        (parallel/pipeline.py::masked_pipeline_encoder). The override
        reads the live encoder/layer_i params each call, so gradients
        flow back to the canonical leaves and the optimizer/checkpoint/
        freeze-mask layout is unchanged."""
        from multimodal_uncertainty_tpu.models.bert import BertLayer
        from multimodal_uncertainty_tpu.parallel.pipeline import (
            masked_pipeline_encoder,
        )

        block = BertLayer(cfg, attn_impl)
        enc = variables["params"]["enc"]["encoder"]
        layer_params = [enc[f"layer_{i}"] for i in range(cfg.num_hidden_layers)]
        encode = masked_pipeline_encoder(
            lambda lp, h, m_: block.apply({"params": lp}, h, m_, False),
            layer_params, pipeline_mesh, microbatches=pipeline_microbatches,
        )
        return model.clone(encoder_override=encode)

    def apply_fn(variables, x, *, train, rngs, seq_keep_mask=None):
        from multimodal_uncertainty_tpu.ops.dw import pallas_dw

        mdl = model if pipeline_parallel <= 1 else _piped_model(variables)
        txt, mask, segment, img = x
        if img.dtype == jnp.uint8:
            img = normalize_on_device(img, FOOD101_MEAN, FOOD101_STD)
        x = (txt, mask, segment, img)
        if seq_keep_mask is None and modality != "both":
            seq_keep_mask = _modality_mask(txt.shape[0], txt.shape[1])
        if train:
            with pallas_dw(fast_dw):
                return mdl.apply(
                    variables, x, train=True, rngs=rngs,
                    mutable=["batch_stats"], seq_keep_mask=seq_keep_mask,
                )
        return (
            mdl.apply(variables, x, train=False, rngs=rngs,
                      seq_keep_mask=seq_keep_mask),
            {},
        )

    bundle = ModelBundle(
        apply_fn=apply_fn,
        loss_fn=model.compute_loss,
        data_forming=None,
        metric_fns=(("acc", partial(accuracy, dummy_dim=False)),),
        grad_mask_fn=mmbt_grad_mask_fn,
    )
    b, lt = 2, sample_txt_len
    sample_x = (
        jnp.zeros((b, lt), jnp.int32),
        jnp.ones((b, lt), jnp.int32),
        jnp.ones((b, lt), jnp.int32),
        jnp.zeros((b, image_size, image_size, 3), jnp.float32),
    )
    state = _init_state(
        model, optimizer, sample_x, key, accum=gradient_accumulation_steps
    )
    if pretrained_bert_sd is not None or pretrained_resnet_sd is not None:
        from multimodal_uncertainty_tpu.models.torch_import import (
            import_mmbt_pretrained,
        )

        variables = import_mmbt_pretrained(
            {"params": state.params, "batch_stats": state.batch_stats},
            bert_sd=pretrained_bert_sd,
            resnet_sd=pretrained_resnet_sd,
            num_layers=cfg.num_hidden_layers,
            resnet_layers=tuple(resnet_layers),
        )
        state = state.replace(
            params=variables["params"], batch_stats=variables["batch_stats"]
        )
    return Setup(model, bundle, optimizer, state, plateau, "epoch", "val_acc")


# ---------------------------------------------------------------------------
# ViLT (reference setup_vilt, train.py:164-182)
# ---------------------------------------------------------------------------


def setup_vilt(
    *,
    n_classes: int,
    lr: float = 3e-5,
    lr_patience: int = 2,
    lr_factor: float = 0.5,
    vilt_config=None,
    image_size: int = 384,
    sample_txt_len: int = 40,
    gradient_accumulation_steps: int = 1,
    seed_key: Optional[jax.Array] = None,
    attn_impl: str = "auto",
    fast_dw=False,
    pretrained_vilt_sd=None,
) -> Setup:
    from multimodal_uncertainty_tpu.models.vilt import (
        ViltConfig,
        ViltForImagesAndTextClassification,
    )

    cfg = vilt_config or dataclasses.replace(
        ViltConfig.b32(), num_labels=n_classes, image_size=image_size
    )
    key = seed_key if seed_key is not None else jax.random.key(0)
    model = ViltForImagesAndTextClassification(config=cfg, attn_impl=attn_impl)
    # torch.optim.AdamW defaults (reference train.py:171): wd=0.01
    optimizer = adamw(constant_schedule(lr), weight_decay=0.01)
    plateau = ReduceLROnPlateau(mode="max", patience=lr_patience, factor=lr_factor)

    def apply_fn(variables, x, *, train, rngs):
        from multimodal_uncertainty_tpu.ops.dw import pallas_dw

        x = dict(x)
        pv = x["pixel_values"]
        if pv.dtype == jnp.uint8:  # normalized on device (mean=std=0.5)
            x["pixel_values"] = (pv.astype(jnp.float32) / 255.0 - 0.5) / 0.5
        with pallas_dw(fast_dw if train else False):
            out = model.apply(variables, x, train=train, rngs=rngs)
        return out.logits, {}

    from multimodal_uncertainty_tpu.ops.losses import plain_cross_entropy

    bundle = ModelBundle(
        apply_fn=apply_fn,
        loss_fn=plain_cross_entropy,
        data_forming=None,
        metric_fns=(("acc", partial(accuracy, dummy_dim=False)),),
    )
    b, lt = 2, sample_txt_len
    sample_x = {
        "input_ids": jnp.zeros((b, lt), jnp.int32),
        "attention_mask": jnp.ones((b, lt), jnp.int32),
        "token_type_ids": jnp.zeros((b, lt), jnp.int32),
        "pixel_values": jnp.zeros((b, cfg.image_size, cfg.image_size, 3), jnp.float32),
        "pixel_mask": jnp.ones((b, cfg.image_size, cfg.image_size), jnp.int32),
    }
    variables = model.init({"params": key}, sample_x, train=False)
    if pretrained_vilt_sd is not None:
        # reference parity: from_pretrained("dandelin/vilt-b32-mlm")
        # (train.py:166-169); mlm checkpoints leave the head random-init
        from multimodal_uncertainty_tpu.models.torch_import import (
            import_vilt_pretrained,
        )

        variables = import_vilt_pretrained(
            variables, pretrained_vilt_sd, num_layers=cfg.num_hidden_layers
        )
    opt_state = optimizer.init(variables["params"])
    state = TrainState(
        params=variables["params"],
        opt_state=opt_state,
        batch_stats=None,
        step=jnp.zeros((), jnp.int32),
        accum_grads=(
            jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
            if gradient_accumulation_steps > 1
            else None
        ),
    )
    return Setup(model, bundle, optimizer, state, plateau, "epoch", "val_acc")
