"""Training-dynamics golden: this framework vs a minimal torch replica.

The accuracy-parity north star (BASELINE.json) cannot be measured in this
environment (no real UPMC-Food-101 / Hateful-Memes data, zero egress), so
this test establishes the strongest CPU-runnable proxy: the SAME synthetic
data trained through our jitted train step and through a line-by-line torch
replica of the reference fusion transformer (``src/model.py:225-304``) with
identical initial weights and identical AdamW hyperparameters must produce
the SAME loss curve, step by step. Forward parity alone (test_bert_parity)
would miss gradient, optimizer, and loss-layout bugs; this covers the whole
training loop's numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from multimodal_uncertainty_tpu.models.fusion import FlavaFusionTransformer
from multimodal_uncertainty_tpu.training.optim import adamw, constant_schedule
from multimodal_uncertainty_tpu.training.state import TrainState
from multimodal_uncertainty_tpu.training.steps import ModelBundle, build_train_step

D_IN, D, LAYERS, HEADS, E, C = 16, 32, 2, 2, 2, 4
B, LI, LT, STEPS = 8, 6, 5, 12
LR, WD = 1e-3, 0.01


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.ln_1 = tnn.LayerNorm(D)
        self.attn = tnn.MultiheadAttention(D, HEADS, batch_first=True)
        self.ln_2 = tnn.LayerNorm(D)
        self.c_fc = tnn.Linear(D, 4 * D)
        self.c_proj = tnn.Linear(4 * D, D)

    def forward(self, x):
        h = self.ln_1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.c_fc(self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return x + self.c_proj(h)


class TorchFusion(tnn.Module):
    """Reference FlavaFusionTransfomer at drop=0 (src/model.py:225-304)."""

    def __init__(self):
        super().__init__()
        self.image_to_mm = tnn.Linear(D_IN, D)
        self.text_to_mm = tnn.Linear(D_IN, D)
        self.ln_pre = tnn.LayerNorm(D)
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(LAYERS)])
        self.ln_post = tnn.LayerNorm(D)
        self.heads = tnn.ModuleList([tnn.Linear(D, C) for _ in range(E)])

    def forward(self, img, txt):
        x = torch.cat([self.image_to_mm(img), self.text_to_mm(txt)], dim=1)
        x = self.ln_pre(x)
        for blk in self.blocks:
            x = blk(x)
        x = self.ln_post(x)
        return torch.stack([f(x[:, i]) for i, f in enumerate(self.heads)], 1)


def _copy_torch_to_flax(tm: TorchFusion, params):
    import copy

    p = copy.deepcopy(jax.tree_util.tree_map(np.asarray, params))

    # .copy() is load-bearing: tensor.numpy() aliases torch's buffers and
    # jnp.asarray on the CPU backend can zero-copy alias numpy — without the
    # copy, torch's in-place opt.step() would silently mutate the jax params.
    def lin(mod):
        return {"kernel": mod.weight.detach().numpy().T.copy(),
                "bias": mod.bias.detach().numpy().copy()}

    def ln(mod):
        return {"weight": mod.weight.detach().numpy().copy(),
                "bias": mod.bias.detach().numpy().copy()}

    p["image_to_mm_projection"] = lin(tm.image_to_mm)
    p["text_to_mm_projection"] = lin(tm.text_to_mm)
    p["ln_pre"] = ln(tm.ln_pre)
    p["ln_post"] = ln(tm.ln_post)
    for i, blk in enumerate(tm.blocks):
        p["mm_encoder"][f"resblocks_{i}"] = {
            "ln_1": ln(blk.ln_1),
            "attn": {
                "in_proj": {
                    "kernel": blk.attn.in_proj_weight.detach().numpy().T.copy(),
                    "bias": blk.attn.in_proj_bias.detach().numpy().copy(),
                },
                "out_proj": lin(blk.attn.out_proj),
            },
            "ln_2": ln(blk.ln_2),
            "c_fc": lin(blk.c_fc),
            "c_proj": lin(blk.c_proj),
        }
    p["output_layers"] = {
        "kernel": np.stack([f.weight.detach().numpy().T for f in tm.heads]),
        "bias": np.stack([f.bias.detach().numpy() for f in tm.heads]),
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


@pytest.fixture(scope="module")
def batches():
    rng = np.random.default_rng(0)
    out = []
    for _ in range(STEPS):
        img = rng.normal(size=(B, LI, D_IN)).astype(np.float32)
        txt = rng.normal(size=(B, LT, D_IN)).astype(np.float32)
        y = rng.integers(0, C, size=B).astype(np.int64)
        out.append((img, txt, y))
    return out


def test_training_loss_curve_matches_torch(batches):
    torch.manual_seed(0)
    tm = TorchFusion()
    tm.train()

    # Mirror torch's INITIAL weights into the flax model before training.
    model = FlavaFusionTransformer(
        out_dim=E, num_classes=C,
        image_hidden_size=D_IN, text_hidden_size=D_IN,
        multimodal_hidden_size=D, multimodal_num_attention_heads=HEADS,
        multimodal_num_hidden_layers=LAYERS, drop=0.0, attn_impl="xla",
    )
    img0, txt0, _ = batches[0]
    variables = model.init(
        {"params": jax.random.key(0)},
        (jnp.asarray(img0), jnp.asarray(txt0)), train=False,
    )
    params = _copy_torch_to_flax(tm, variables["params"])

    opt = torch.optim.AdamW(
        tm.parameters(), lr=LR, betas=(0.9, 0.999), eps=1e-8, weight_decay=WD
    )
    ce = tnn.CrossEntropyLoss()
    torch_losses = []
    for img, txt, y in batches:
        opt.zero_grad()
        out = tm(torch.tensor(img), torch.tensor(txt))
        # MultiHead layout: same label for every head, flattened (B*E)
        yy = torch.tensor(y)[:, None].expand(B, E)
        loss = ce(out.reshape(-1, C), yy.reshape(-1))
        loss.backward()
        opt.step()
        torch_losses.append(float(loss))

    def apply_fn(variables, x, *, train, rngs):
        return model.apply(variables, x, train=train, rngs=rngs), {}

    bundle = ModelBundle(apply_fn=apply_fn, loss_fn=model.compute_loss)
    optimizer = adamw(constant_schedule(LR), weight_decay=WD)
    state = TrainState(
        params=params, opt_state=optimizer.init(params),
        batch_stats=None, step=jnp.zeros((), jnp.int32), accum_grads=None,
    )
    step = build_train_step(bundle, optimizer, donate=False)

    jax_losses = []
    for img, txt, y in batches:
        yy = np.repeat(np.asarray(y)[:, None], E, axis=1)
        state, logs = step(
            state, (jnp.asarray(img), jnp.asarray(txt)), jnp.asarray(yy),
            jax.random.key(1), None,
        )
        jax_losses.append(float(logs["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-4, atol=2e-5)
    # the curve must actually descend (guards against both sides being
    # trivially constant)
    assert jax_losses[-1] < jax_losses[0]
