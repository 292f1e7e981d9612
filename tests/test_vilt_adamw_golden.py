"""ViLT + AdamW end-to-end training-dynamics golden (VERDICT r2 missing #3,
remaining half — the MMBT/BertAdam half lives in test_mmbt_bertadam_golden).

Trains a tiny-but-complete ViLT (2 pre-LN ViT blocks over 4 image patches +
text, modality-type table, pooler, 4-stage classification head) through this
framework's production wiring (``zoo.setup_vilt`` bundle + jitted train step
+ ``adamw``) and through the HF torch ``ViltForImagesAndTextClassification``
driven by ``torch.optim.AdamW(model.parameters(), lr)`` — exactly the
reference's ViLT optimizer setup (reference ``train.py:164-182``: default
betas/eps/weight_decay=0.01, HF-internal CE loss). Same init (weights
imported via ``import_vilt_pretrained``), same data, per-step losses
asserted to agree. Complements ``test_vilt_parity.py`` (single-forward
logits/loss parity) by pinning the *training dynamics*: grads through the
full graph, bias-corrected decoupled-decay AdamW, 10+ steps.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_uncertainty_tpu.models.torch_import import import_vilt_pretrained
from multimodal_uncertainty_tpu.models.vilt import ViltConfig
from multimodal_uncertainty_tpu.training.steps import build_train_step
from multimodal_uncertainty_tpu.zoo import setup_vilt

B, LT, IMG, CLS = 8, 7, 64, 3
LR, STEPS = 1e-3, 12


def _tiny_pair():
    from transformers import ViltConfig as HFViltConfig
    from transformers import ViltForImagesAndTextClassification as HFVilt

    hf_cfg = HFViltConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=37,
        max_position_embeddings=40, type_vocab_size=2,
        modality_type_vocab_size=2, image_size=IMG, patch_size=32,
        num_images=1, num_labels=CLS,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = HFVilt(hf_cfg)

    cfg = ViltConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=37,
        max_position_embeddings=40, image_size=IMG, patch_size=32,
        num_labels=CLS, num_images=1, dropout=0.0,
    )
    return hf, cfg


def _batches(rng, n):
    out = []
    for _ in range(n):
        ids = rng.integers(0, 99, size=(B, LT)).astype(np.int64)
        mask = np.ones((B, LT), np.int64)
        mask[: B // 2, LT - 2:] = 0  # exercise the text-padding mask path
        out.append({
            "input_ids": ids,
            "attention_mask": mask,
            "token_type_ids": np.zeros((B, LT), np.int64),
            "pixel_values": rng.normal(size=(B, 1, 3, IMG, IMG)).astype(np.float32),
            "pixel_mask": np.ones((B, 1, IMG, IMG), np.int64),
            "labels": rng.integers(0, CLS, size=B).astype(np.int64),
        })
    return out


def test_vilt_adamw_dynamics_match_torch():
    hf, cfg = _tiny_pair()
    hf.train()

    # ---- this framework, production wiring --------------------------------
    setup = setup_vilt(
        n_classes=CLS, lr=LR, vilt_config=cfg, image_size=IMG,
        sample_txt_len=LT, attn_impl="xla", seed_key=jax.random.key(0),
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = import_vilt_pretrained(
        {"params": setup.state.params}, sd, num_layers=cfg.num_hidden_layers
    )
    state = setup.state.replace(
        params=variables["params"],
        opt_state=setup.optimizer.init(variables["params"]),
    )
    step = build_train_step(setup.bundle, setup.optimizer, donate=False)

    # ---- torch replica: reference optimizer setup (train.py:171) ----------
    opt_t = torch.optim.AdamW(hf.parameters(), lr=LR)

    data = _batches(np.random.default_rng(7), STEPS)
    torch_losses, jax_losses = [], []
    for i, batch in enumerate(data):
        opt_t.zero_grad()
        out = hf(
            input_ids=torch.tensor(batch["input_ids"]),
            attention_mask=torch.tensor(batch["attention_mask"]),
            token_type_ids=torch.tensor(batch["token_type_ids"]),
            pixel_values=torch.tensor(batch["pixel_values"]),
            pixel_mask=torch.tensor(batch["pixel_mask"]),
            labels=torch.tensor(batch["labels"]),
        )
        out.loss.backward()
        opt_t.step()
        torch_losses.append(float(out.loss.detach()))

        x = {k: jnp.asarray(v) for k, v in batch.items() if k != "labels"}
        state, logs = step(
            state, x, jnp.asarray(batch["labels"]), jax.random.key(i)
        )
        jax_losses.append(float(logs["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-4)
    # params are actually moving (losses vary step to step; with random
    # labels on a tiny model the trajectory hovers near ln(CLS) rather than
    # descending monotonically — per-step agreement above is the real check)
    assert np.std(jax_losses) > 1e-3
    assert np.all(np.isfinite(jax_losses))
