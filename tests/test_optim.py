"""Optimizer parity tests vs torch + schedule/plateau semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_uncertainty_tpu.training.optim import (
    ReduceLROnPlateau,
    adamw,
    bert_adam,
    constant_schedule,
    cosine_warmup_schedule,
    no_decay_mask,
    sgd,
    warmup_linear_schedule,
)


def _run_updates(opt, params0, grads_seq):
    state = opt.init(params0)
    params = params0
    for g in grads_seq:
        updates, state = opt.update(g, state, params)
        params = jax.tree_util.tree_map(jnp.add, params, updates)
    return params


def test_sgd_matches_torch():
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    p = torch.nn.Parameter(torch.tensor(w0))
    opt_t = torch.optim.SGD([p], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in grads:
        opt_t.zero_grad()
        p.grad = torch.tensor(g)
        opt_t.step()

    opt_j = sgd(constant_schedule(0.1), momentum=0.9, weight_decay=0.01)
    params = _run_updates(opt_j, {"w": jnp.asarray(w0)},
                          [{"w": jnp.asarray(g)} for g in grads])
    np.testing.assert_allclose(np.asarray(params["w"]), p.detach().numpy(), atol=1e-6)


def test_adamw_matches_torch():
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(5)]

    p = torch.nn.Parameter(torch.tensor(w0))
    opt_t = torch.optim.AdamW([p], lr=1e-3, betas=(0.9, 0.98), eps=1e-9,
                              weight_decay=0.05)
    for g in grads:
        opt_t.zero_grad()
        p.grad = torch.tensor(g)
        opt_t.step()

    opt_j = adamw(constant_schedule(1e-3), b1=0.9, b2=0.98, eps=1e-9,
                  weight_decay=0.05)
    params = _run_updates(opt_j, {"w": jnp.asarray(w0)},
                          [{"w": jnp.asarray(g)} for g in grads])
    # torch AdamW: p -= lr*wd*p THEN adam update on the ORIGINAL gradient.
    # Our decoupled form folds both into one delta; equal to 1st order in lr.
    np.testing.assert_allclose(np.asarray(params["w"]), p.detach().numpy(),
                               atol=2e-6)


def test_bert_adam_semantics():
    """No bias correction, per-param clip, wd inside update, warmup-linear."""
    w0 = np.ones((2, 2), np.float32)
    g = np.full((2, 2), 10.0, np.float32)  # norm 20 -> clipped to norm 1

    opt = bert_adam(lr=0.1, warmup=0.5, t_total=10, weight_decay=0.01,
                    max_grad_norm=1.0, decay_mask={"w": True})
    state = opt.init({"w": jnp.asarray(w0)})
    updates, state = opt.update({"w": jnp.asarray(g)}, state, {"w": jnp.asarray(w0)})

    # manual: clipped g = g/20; m = 0.1*gc; v = 0.001*gc^2
    gc = g / 20.0
    m = 0.1 * gc
    v = 0.001 * gc * gc
    upd = m / (np.sqrt(v) + 1e-6) + 0.01 * w0
    # schedule at step 0: x=0 < warmup -> 0/0.5 = 0 -> lr_t = 0
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.0 * upd, atol=1e-9)

    # second step: x = 1/10 = 0.1 < 0.5 -> factor 0.2 -> lr_t = 0.02
    updates2, state = opt.update({"w": jnp.asarray(g)}, state, {"w": jnp.asarray(w0)})
    m2 = 0.9 * m + 0.1 * gc
    v2 = 0.999 * v + 0.001 * gc * gc
    upd2 = m2 / (np.sqrt(v2) + 1e-6) + 0.01 * w0
    np.testing.assert_allclose(np.asarray(updates2["w"]), -0.02 * upd2, rtol=1e-5)


def test_warmup_linear_goes_negative_past_t_total():
    fn = warmup_linear_schedule(1.0, 0.1, 10)
    assert float(fn(jnp.asarray(11))) < 0  # preserved BertAdam quirk


def test_cosine_warmup_matches_hf():
    import math

    fn = cosine_warmup_schedule(1.0, warmup_steps=10, total_steps=100)

    def hf(step):
        if step < 10:
            return step / 10
        progress = (step - 10) / 90
        return max(0.0, 0.5 * (1 + math.cos(math.pi * progress)))

    for s in [0, 5, 10, 50, 99, 100]:
        assert abs(float(fn(jnp.asarray(s))) - hf(s)) < 1e-6


def test_no_decay_mask():
    """Replicates torch name-based grouping: only 'bias' leaves and modules
    whose torch name contains 'LayerNorm' are excluded — the reference
    DECAYS CLIP-style ln_pre/ln_1 scales and BatchNorm scales because their
    torch names ('ln_pre.weight', 'bn1.weight') don't match the list."""
    params = {
        "ln_pre": {"weight": jnp.ones(3), "bias": jnp.ones(3)},
        "c_fc": {"kernel": jnp.ones((3, 3)), "bias": jnp.ones(3)},
        "out": {"kernel": jnp.ones((3, 3))},
        "attn_output_LayerNorm": {"weight": jnp.ones(3), "bias": jnp.ones(3)},
        "txt_embeddings": {"ln_weight": jnp.ones(3), "ln_bias": jnp.ones(3)},
        "bn1": {"bn": {"scale": jnp.ones(3), "bias": jnp.ones(3)}},
    }
    mask = no_decay_mask(params)
    assert mask["ln_pre"]["weight"] is True   # torch name 'ln_pre.weight'
    assert mask["ln_pre"]["bias"] is False
    assert mask["c_fc"]["kernel"] is True
    assert mask["c_fc"]["bias"] is False
    assert mask["out"]["kernel"] is True
    assert mask["attn_output_LayerNorm"]["weight"] is False
    assert mask["attn_output_LayerNorm"]["bias"] is False
    assert mask["txt_embeddings"]["ln_weight"] is False  # shared BERT emb LN
    assert mask["txt_embeddings"]["ln_bias"] is False
    assert mask["bn1"]["bn"]["scale"] is True  # torch decays BN weights
    assert mask["bn1"]["bn"]["bias"] is False


def test_plateau_matches_torch():
    metrics = [1.0, 0.9, 0.91, 0.92, 0.93, 0.85, 0.86, 0.87, 0.88, 0.89, 0.9]
    p = torch.nn.Parameter(torch.zeros(1))
    opt_t = torch.optim.SGD([p], lr=1.0)
    sch_t = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt_t, mode="min", factor=0.5, patience=2
    )
    ours = ReduceLROnPlateau(mode="min", factor=0.5, patience=2)
    for m in metrics:
        sch_t.step(m)
        scale = ours.step(m)
        assert abs(scale - opt_t.param_groups[0]["lr"]) < 1e-9, m


def test_plateau_max_mode():
    ours = ReduceLROnPlateau(mode="max", factor=0.1, patience=1)
    # improving: no decay
    for m in [0.1, 0.2, 0.3]:
        s = ours.step(m)
    assert s == 1.0
    # stagnating: decay after patience+1 bad epochs
    ours.step(0.3)
    s = ours.step(0.3)
    assert abs(s - 0.1) < 1e-12
