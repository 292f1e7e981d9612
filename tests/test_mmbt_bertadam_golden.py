"""MMBT + BertAdam end-to-end training-dynamics golden (VERDICT r2 item #2).

Trains a tiny-but-complete MMBT (2-layer BERT + (1,1,1,1) Bottleneck ResNet
trunk + shared-embedding image wrapper + pooler + classifier) through this
framework's production wiring (``zoo.setup_mmbt`` bundle + jitted train step
+ ``bert_adam``) and through a line-by-line torch replica driven by a
faithful reimplementation of ``pytorch_pretrained_bert.BertAdam`` (the
reference's optimizer, ``train.py:142-147``: per-PARAM step counters and
grad clipping, NO bias correction, weight decay inside the update,
warmup-linear schedule, name-based decay grouping). Same init, same data,
including a freeze->unfreeze boundary for both the image trunk and the BERT
encoder (``src/framework.py:280-285`` toggles ``requires_grad``; frozen
params are skipped ENTIRELY by BertAdam — no moment/step advance — so their
warmup schedule lags after unfreezing). Asserts per-step loss agreement.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from multimodal_uncertainty_tpu.models.bert import BertConfig
from multimodal_uncertainty_tpu.models.torch_import import import_mmbt_pretrained
from multimodal_uncertainty_tpu.training.steps import build_train_step
from multimodal_uncertainty_tpu.zoo import setup_mmbt

HID, LAYERS, HEADS, INTER, VOCAB = 32, 2, 2, 64, 120
B, LT, IMG, N_IMG, CLS = 8, 8, 64, 3, 5
LR, WARMUP, STEPS = 1e-3, 0.4, 14
FREEZE_IMG_STEPS, FREEZE_TXT_STEPS = 7, 3

NO_DECAY = ["bias", "LayerNorm.bias", "LayerNorm.weight"]


class RefBertAdam:
    """pytorch_pretrained_bert.BertAdam semantics (optimization.py of that
    package): per-param state['step'] used PRE-increment in the schedule,
    ``if p.grad is None: continue``, per-param clip_grad_norm_, m/v with no
    bias correction, wd added into the update."""

    def __init__(self, groups, lr, warmup, t_total,
                 b1=0.9, b2=0.999, e=1e-6, max_grad_norm=1.0):
        self.groups, self.lr, self.warmup, self.t_total = groups, lr, warmup, t_total
        self.b1, self.b2, self.e, self.max_grad_norm = b1, b2, e, max_grad_norm
        self.state = {}

    def step(self):
        for group in self.groups:
            for p in group["params"]:
                if p.grad is None:
                    continue
                st = self.state.setdefault(
                    id(p),
                    {"step": 0, "m": torch.zeros_like(p), "v": torch.zeros_like(p)},
                )
                if self.max_grad_norm > 0:
                    tnn.utils.clip_grad_norm_([p], self.max_grad_norm)
                g = p.grad.data
                st["m"].mul_(self.b1).add_(g, alpha=1 - self.b1)
                st["v"].mul_(self.b2).addcmul_(g, g, value=1 - self.b2)
                update = st["m"] / (st["v"].sqrt() + self.e)
                if group["weight_decay"] > 0:
                    update = update + group["weight_decay"] * p.data
                x = st["step"] / self.t_total
                sched = x / self.warmup if x < self.warmup else 1.0 - x
                p.data.add_(update, alpha=-(self.lr * sched))
                st["step"] += 1

    def zero_grad(self):
        for group in self.groups:
            for p in group["params"]:
                p.grad = None


class _Bottleneck(tnn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return torch.relu(out + res)


class _Trunk(tnn.Module):
    """torchvision-ResNet-naming trunk so convert_resnet_trunk reads its
    state dict directly (children()[:-2] of resnet, reference src/mmbt.py:19)."""

    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
            stride = 1 if stage == 0 else 2
            seq = []
            for j in range(blocks):
                s = stride if j == 0 else 1
                down = None
                if j == 0 and (s != 1 or inplanes != planes * 4):
                    down = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes * 4, 1, s, bias=False),
                        tnn.BatchNorm2d(planes * 4),
                    )
                seq.append(_Bottleneck(inplanes, planes, s, down))
                inplanes = planes * 4
            setattr(self, f"layer{stage + 1}", tnn.Sequential(*seq))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in (1, 2, 3, 4):
            x = getattr(self, f"layer{i}")(x)
        return x  # (B, 2048, h, w)


class TorchMMBT(tnn.Module):
    """Reference MultimodalBertClf (src/mmbt.py) on a transformers BertModel
    (same graph as pytorch_pretrained_bert's at dropout=0)."""

    def __init__(self, hf_bert, n_img=N_IMG, n_classes=CLS):
        super().__init__()
        self.bert = hf_bert
        self.trunk = _Trunk()
        self.pool = tnn.AdaptiveAvgPool2d((n_img, 1))
        self.img_proj = tnn.Linear(2048, HID)
        self.clf = tnn.Linear(HID, n_classes)
        self.n_img = n_img

    def forward(self, txt, mask, segment, img):
        bsz = txt.shape[0]
        feats = self.trunk(img)
        im = self.pool(feats).flatten(2).transpose(1, 2)  # (B, N, 2048)

        emb = self.bert.embeddings
        imgs_emb = self.img_proj(im)
        cls_tok = emb.word_embeddings.weight[101].expand(bsz, 1, HID)
        sep_tok = emb.word_embeddings.weight[102].expand(bsz, 1, HID)
        tok = torch.cat([cls_tok, imgs_emb, sep_tok], 1)
        n = tok.shape[1]
        pos = emb.position_embeddings.weight[:n][None]
        tt = emb.token_type_embeddings(torch.zeros(bsz, n, dtype=torch.long))
        img_embed = emb.LayerNorm(tok + pos + tt)

        txt_embed = emb(input_ids=txt, token_type_ids=segment)

        x = torch.cat([img_embed, txt_embed], 1)
        full = torch.cat([torch.ones(bsz, n), mask.float()], 1)
        ext = (1.0 - full[:, None, None, :]) * -10000.0  # src/mmbt.py:103-113
        hidden = self.bert.encoder(x, attention_mask=ext)[0]
        pooled = self.bert.pooler(hidden)
        return self.clf(pooled)


def _batches(rng, n):
    out = []
    for _ in range(n):
        txt = rng.integers(0, VOCAB, size=(B, LT)).astype(np.int32)
        mask = np.ones((B, LT), np.int32)
        mask[: B // 2, LT - 2:] = 0
        seg = np.ones((B, LT), np.int32)
        img = rng.normal(size=(B, IMG, IMG, 3)).astype(np.float32)
        y = rng.integers(0, CLS, size=B).astype(np.int64)
        out.append((txt, mask, seg, img, y))
    return out


def test_mmbt_bertadam_dynamics_match_torch():
    from transformers import BertConfig as HFConfig
    from transformers import BertModel

    torch.manual_seed(0)
    hf = BertModel(HFConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    ))
    tm = TorchMMBT(hf)
    tm.train()

    # ---- this framework, production wiring -------------------------------
    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=INTER,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    setup = setup_mmbt(
        n_classes=CLS, lr=LR, warmup=WARMUP, total_steps=STEPS,
        num_image_embeds=N_IMG, bert_config=cfg, resnet_layers=(1, 1, 1, 1),
        dropout=0.0, gradient_accumulation_steps=1, image_size=IMG,
        sample_txt_len=LT, attn_impl="xla", seed_key=jax.random.key(0),
    )

    # mirror torch's initial weights into the flax variables
    variables = {"params": setup.state.params}
    if setup.state.batch_stats is not None:
        variables["batch_stats"] = setup.state.batch_stats
    merged = import_mmbt_pretrained(
        variables, bert_sd={k: v for k, v in hf.state_dict().items()},
        resnet_sd=tm.trunk.state_dict(), num_layers=LAYERS,
        resnet_layers=(1, 1, 1, 1),
    )
    merged["params"]["enc"]["img_embeddings"]["img_embeddings"] = {
        "kernel": jnp.asarray(tm.img_proj.weight.detach().numpy().T.copy()),
        "bias": jnp.asarray(tm.img_proj.bias.detach().numpy().copy()),
    }
    merged["params"]["clf"] = {
        "kernel": jnp.asarray(tm.clf.weight.detach().numpy().T.copy()),
        "bias": jnp.asarray(tm.clf.bias.detach().numpy().copy()),
    }
    state = setup.state.replace(
        params=merged["params"],
        batch_stats=merged["batch_stats"],
        opt_state=setup.optimizer.init(merged["params"]),
    )
    step = build_train_step(setup.bundle, setup.optimizer, donate=False)

    # ---- torch replica: reference optimizer + grouping --------------------
    named = list(tm.named_parameters())
    groups = [
        {"params": [p for n, p in named if not any(nd in n for nd in NO_DECAY)],
         "weight_decay": 0.01},
        {"params": [p for n, p in named if any(nd in n for nd in NO_DECAY)],
         "weight_decay": 0.0},
    ]
    opt_t = RefBertAdam(groups, lr=LR, warmup=WARMUP, t_total=STEPS)
    ce = tnn.CrossEntropyLoss()

    data = _batches(np.random.default_rng(3), STEPS)
    torch_losses, jax_losses = [], []
    for i, (txt, mask, seg, img, y) in enumerate(data):
        freeze_img = i < FREEZE_IMG_STEPS
        freeze_txt = i < FREEZE_TXT_STEPS

        # torch: requires_grad toggling exactly as src/framework.py:280-285
        for p in tm.trunk.parameters():
            p.requires_grad_(not freeze_img)
        for p in tm.bert.encoder.parameters():
            p.requires_grad_(not freeze_txt)
        opt_t.zero_grad()
        out = tm(torch.tensor(txt, dtype=torch.long), torch.tensor(mask),
                 torch.tensor(seg, dtype=torch.long),
                 torch.tensor(img).permute(0, 3, 1, 2).contiguous())
        loss = ce(out, torch.tensor(y))
        loss.backward()
        opt_t.step()
        torch_losses.append(float(loss.detach()))

        flags = jnp.asarray([freeze_img, freeze_txt])
        state, logs = step(
            state,
            tuple(jnp.asarray(a) for a in (txt, mask, seg, img)),
            jnp.asarray(y), jax.random.key(i), flags,
        )
        jax_losses.append(float(logs["loss"]))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3, atol=1e-4)
    assert jax_losses[-1] < jax_losses[0]  # actually descending

    # per-param schedule lag: a trunk leaf's step count must equal the
    # number of UNFROZEN steps, not the global step count
    trunk_step = jax.tree_util.tree_leaves(
        state.opt_state["step"]["enc"]["img_encoder"]
    )[0]
    live_step = jax.tree_util.tree_leaves(
        state.opt_state["step"]["clf"]
    )[0]
    assert int(trunk_step) == STEPS - FREEZE_IMG_STEPS
    assert int(live_step) == STEPS
