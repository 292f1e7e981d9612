"""Masked-variant forward parity + robustness sweep layout tests.

The central claim of the TPU re-design: a boolean keep-mask forward is
numerically identical to the reference's physical token slicing. These tests
prove it on the actual fusion model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_uncertainty_tpu.evals.robustness_fmnist import missing_view_sweep
from multimodal_uncertainty_tpu.evals.robustness_transformer import (
    build_variant_masks,
    transformer_robustness_sweep,
)
from multimodal_uncertainty_tpu.models import FlavaFusionTransformer
from multimodal_uncertainty_tpu.ops.data_forming import data_forming_func
from multimodal_uncertainty_tpu.zoo import setup_fashionmnist

B, LI, LT, D = 4, 9, 7, 48


def _model_and_vars(avg_pool=False, cls_token=False, out_dim=2):
    model = FlavaFusionTransformer(
        out_dim=out_dim,
        num_classes=3,
        image_hidden_size=D,
        text_hidden_size=D,
        multimodal_hidden_size=D,
        multimodal_num_attention_heads=2,
        multimodal_num_hidden_layers=2,
        avg_pool=avg_pool,
        cls_token=cls_token,
        attn_impl="xla",
    )
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, LI, D)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(B, LT, D)).astype(np.float32))
    variables = model.init({"params": jax.random.key(0)}, (img, txt), train=False)
    return model, variables, img, txt


@pytest.mark.parametrize("cls_token", [False, True])
def test_masked_equals_sliced_subset(cls_token):
    model, variables, img, txt = _model_and_vars(cls_token=cls_token)
    rng = np.random.default_rng(1)
    img_keep = np.sort(rng.permutation(LI)[:5])
    txt_keep = np.sort(rng.permutation(LT)[:4])
    im = np.zeros(LI, bool); im[img_keep] = True
    tm = np.zeros(LT, bool); tm[txt_keep] = True

    masked = model.apply(
        variables,
        (img, txt),
        train=False,
        img_mask=jnp.broadcast_to(jnp.asarray(im)[None], (B, LI)),
        txt_mask=jnp.broadcast_to(jnp.asarray(tm)[None], (B, LT)),
    )
    sliced = model.apply(
        variables, (img[:, img_keep], txt[:, txt_keep]), train=False
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(sliced), atol=1e-4)


@pytest.mark.parametrize("missing", ["image", "text"])
def test_masked_equals_missing_modality(missing):
    model, variables, img, txt = _model_and_vars()
    if missing == "text":
        masked = model.apply(
            variables,
            (img, txt),
            train=False,
            img_mask=jnp.ones((B, LI), bool),
            txt_mask=jnp.zeros((B, LT), bool),
        )
        sliced = model.apply(variables, (img, None), train=False)
    else:
        masked = model.apply(
            variables,
            (img, txt),
            train=False,
            img_mask=jnp.zeros((B, LI), bool),
            txt_mask=jnp.ones((B, LT), bool),
        )
        sliced = model.apply(variables, (None, txt), train=False)
    np.testing.assert_allclose(np.asarray(masked), np.asarray(sliced), atol=1e-4)


def test_masked_avg_pool_segment_means():
    model, variables, img, txt = _model_and_vars(avg_pool=True)
    rng = np.random.default_rng(2)
    img_keep = np.sort(rng.permutation(LI)[:6])
    txt_keep = np.sort(rng.permutation(LT)[:3])
    im = np.zeros(LI, bool); im[img_keep] = True
    tm = np.zeros(LT, bool); tm[txt_keep] = True
    masked = model.apply(
        variables,
        (img, txt),
        train=False,
        img_mask=jnp.broadcast_to(jnp.asarray(im)[None], (B, LI)),
        txt_mask=jnp.broadcast_to(jnp.asarray(tm)[None], (B, LT)),
    )
    sliced = model.apply(
        variables, (img[:, img_keep], txt[:, txt_keep]), train=False
    )
    np.testing.assert_allclose(np.asarray(masked), np.asarray(sliced), atol=1e-4)


def test_variant_mask_layout():
    rng = np.random.default_rng(0)
    img_masks, txt_masks = build_variant_masks(rng, LI, LT, n_repeats=5)
    assert img_masks.shape == (13, LI) and txt_masks.shape == (13, LT)
    assert img_masks[0].all() and txt_masks[0].all()          # full
    assert img_masks[1].all() and not txt_masks[1].any()      # image-only
    assert not img_masks[2].any() and txt_masks[2].all()      # text-only
    # image controls: n_img ~ U(0, l_img), n_txt = min(l_img - n_img, l_txt)
    # (the reference clips via randperm(l)[:n]); text controls symmetric.
    for v in range(3, 8):
        n_img = img_masks[v].sum()
        assert txt_masks[v].sum() == min(LI - n_img, LT)
    for v in range(8, 13):
        n_txt = txt_masks[v].sum()
        assert img_masks[v].sum() == min(LT - n_txt, LI)


def test_transformer_sweep_shapes_and_columns():
    model, variables, img, txt = _model_and_vars()
    y = np.arange(B) % 3

    loader = [((np.asarray(img), np.asarray(txt)), y)]

    def apply_fn(variables, x, *, train, rngs, img_mask=None, txt_mask=None):
        return (
            model.apply(
                variables, x, train=train, img_mask=img_mask, txt_mask=txt_mask
            ),
            {},
        )

    preds, labels = transformer_robustness_sweep(
        apply_fn, variables, loader, n_repeats=2, seed=0
    )
    assert preds.shape == (B, 3 + 2 * 2, 2, 3)
    assert (labels == y).all()
    # column 1 must equal an explicit image-only forward
    img_only = np.asarray(model.apply(variables, (img, None), train=False))
    np.testing.assert_allclose(preds[:, 1], img_only, atol=1e-4)
    txt_only = np.asarray(model.apply(variables, (None, txt), train=False))
    np.testing.assert_allclose(preds[:, 2], txt_only, atol=1e-4)
    full = np.asarray(model.apply(variables, (img, txt), train=False))
    np.testing.assert_allclose(preds[:, 0], full, atol=1e-4)


def test_missing_view_sweep_layouts():
    # non-weight-sharing: (M_, S, M, C) with view i zeroed
    setup = setup_fashionmnist(model_type="MultiHead", seed_key=jax.random.key(3))
    x = np.random.default_rng(4).normal(size=(6, 4, 1, 14, 14)).astype(np.float32)
    y = np.arange(6) % 10
    loader = [(x, y)]
    df = lambda k, xx, yy, phase: data_forming_func(  # noqa: E731
        k, xx, yy, phase=phase, model_type="MultiHead"
    )
    outputs, labels = missing_view_sweep(
        setup.bundle.apply_fn,
        {"params": setup.state.params, "batch_stats": setup.state.batch_stats},
        loader,
        model_type="MultiHead",
        data_forming=df,
    )
    assert outputs.shape == (4, 6, 4, 10)
    # variant i must equal a manual forward with view i zeroed
    x0 = x.copy(); x0[:, 2] = 0.0
    manual = setup.bundle.apply_fn(
        {"params": setup.state.params, "batch_stats": setup.state.batch_stats},
        jnp.asarray(x0), train=False, rngs=None,
    )[0]
    np.testing.assert_allclose(outputs[2], np.asarray(manual), atol=1e-5)

    # weight-sharing: (M_, S, m-1, C), labels repeated per kept view
    setup_ws = setup_fashionmnist(
        model_type="single-model-weight-sharing", seed_key=jax.random.key(5)
    )
    outputs, labels = missing_view_sweep(
        setup_ws.bundle.apply_fn,
        {"params": setup_ws.state.params, "batch_stats": setup_ws.state.batch_stats},
        loader,
        model_type="single-model-weight-sharing",
        data_forming=None,
    )
    assert outputs.shape == (4, 6, 3, 10)
    assert labels.shape == (18,)


def test_fusion_remat_identical_loss_and_grads():
    """--remat on the fusion transformer: same loss and gradients."""
    from multimodal_uncertainty_tpu.models.fusion import FlavaFusionTransformer

    rng = np.random.default_rng(9)
    img = jnp.asarray(rng.normal(size=(4, 6, 16)).astype(np.float32))
    txt = jnp.asarray(rng.normal(size=(4, 5, 16)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 3, size=(4, 2)))
    models = {
        r: FlavaFusionTransformer(
            out_dim=2, num_classes=3, image_hidden_size=16,
            text_hidden_size=16, multimodal_hidden_size=32,
            multimodal_num_attention_heads=2, multimodal_num_hidden_layers=2,
            attn_impl="xla", remat=r,
        )
        for r in (False, True)
    }
    params = models[False].init(
        {"params": jax.random.key(0)}, (img, txt), train=False
    )["params"]
    vals, grads = {}, {}
    for r, m in models.items():
        def loss_fn(p):
            logits = m.apply({"params": p}, (img, txt), train=True,
                             rngs={"dropout": jax.random.key(1)})
            return m.compute_loss(logits, y)

        vals[r], grads[r] = jax.value_and_grad(loss_fn)(params)
    assert abs(float(vals[True]) - float(vals[False])) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(grads[True]),
                    jax.tree_util.tree_leaves(grads[False])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_sweep_on_dp_mesh_matches_single_device():
    """mesh=: the sweep batch shards over 'data'; outputs identical to the
    single-device sweep (same seed -> same control masks), including a
    final batch that does not divide the data axis (placed replicated)."""
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    model, variables, img, txt = _model_and_vars()
    y = np.arange(B) % 3
    # batch 2: B rows (divides 8 iff B does) + a 3-row remainder batch
    loader = [
        ((np.asarray(img), np.asarray(txt)), y),
        ((np.asarray(img)[:3], np.asarray(txt)[:3]), y[:3]),
    ]

    def apply_fn(variables, x, *, train, rngs, img_mask=None, txt_mask=None):
        return (
            model.apply(
                variables, x, train=train, img_mask=img_mask, txt_mask=txt_mask
            ),
            {},
        )

    single = transformer_robustness_sweep(
        apply_fn, variables, loader, n_repeats=2, seed=0
    )
    mesh = make_mesh(8, model_parallel=1)
    sharded = transformer_robustness_sweep(
        apply_fn, variables, loader, n_repeats=2, seed=0, mesh=mesh
    )
    np.testing.assert_allclose(sharded[0], single[0], atol=1e-5)
    np.testing.assert_array_equal(sharded[1], single[1])


def test_mmbt_sweep_columns_and_dp_mesh():
    """MMBT sweep: (S, V, C) layout, column 1/2 == the encoder's own
    img-only/txt-only keep-masks, and mesh= matches single-device."""
    from multimodal_uncertainty_tpu.evals.robustness_mmbt import (
        mmbt_robustness_sweep,
    )
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.models.mmbt import (
        MultimodalBertClf,
        MultimodalBertEncoder,
    )
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    n_img = 3
    model = MultimodalBertClf(config=cfg, n_classes=4, num_image_embeds=n_img,
                              resnet_layers=(1, 1, 1, 1), attn_impl="xla")
    rng = np.random.default_rng(0)
    b, lt = 5, 6
    x = (rng.integers(0, 120, size=(b, lt)).astype(np.int32),
         np.ones((b, lt), np.int32), np.ones((b, lt), np.int32),
         rng.normal(size=(b, 64, 64, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0)},
        jax.tree_util.tree_map(jnp.asarray, x), train=False,
    )
    y = np.arange(b) % 4
    loader = [(x, y)]

    def apply_fn(v, xx, *, train, rngs, seq_keep_mask=None):
        return (
            model.apply(v, xx, train=train, seq_keep_mask=seq_keep_mask),
            {},
        )

    preds, labels = mmbt_robustness_sweep(
        apply_fn, variables, loader, num_image_embeds=n_img, n_repeats=2,
        seed=0,
    )
    assert preds.shape == (b, 3 + 2 * 2, 4)
    assert (labels == y).all()

    helper = MultimodalBertEncoder(cfg, n_img)
    jx = jax.tree_util.tree_map(jnp.asarray, x)
    img_only = np.asarray(model.apply(
        variables, jx, train=False, seq_keep_mask=helper.img_only_mask(b, lt)
    ))
    txt_only = np.asarray(model.apply(
        variables, jx, train=False, seq_keep_mask=helper.txt_only_mask(b, lt)
    ))
    np.testing.assert_allclose(preds[:, 1], img_only, atol=1e-4)
    np.testing.assert_allclose(preds[:, 2], txt_only, atol=1e-4)

    mesh = make_mesh(8, model_parallel=1)
    sharded, _ = mmbt_robustness_sweep(
        apply_fn, variables, loader, num_image_embeds=n_img, n_repeats=2,
        seed=0, mesh=mesh,
    )
    np.testing.assert_allclose(sharded, preds, atol=1e-5)


def test_fmnist_eval_paths_on_dp_mesh_match_single_device():
    """missing_view_sweep and save_predictions with mesh= equal the
    single-device outputs (incl. the weight-sharing fold and a batch that
    does not divide the data axis)."""
    from multimodal_uncertainty_tpu.evals.prediction_saving import (
        save_predictions,
    )
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, model_parallel=1)
    x = np.random.default_rng(8).normal(size=(6, 4, 1, 14, 14)).astype(
        np.float32
    )
    y = np.arange(6) % 10
    loader = [(x, y)]

    for mt in ("MultiHead", "single-model-weight-sharing"):
        setup = setup_fashionmnist(model_type=mt, seed_key=jax.random.key(3))
        variables = {"params": setup.state.params,
                     "batch_stats": setup.state.batch_stats}
        df = lambda k, xx, yy, phase: data_forming_func(  # noqa: E731
            k, xx, yy, phase=phase, model_type=mt
        )
        single = missing_view_sweep(
            setup.bundle.apply_fn, variables, loader, model_type=mt,
            data_forming=df,
        )
        sharded = missing_view_sweep(
            setup.bundle.apply_fn, variables, loader, model_type=mt,
            data_forming=df, mesh=mesh,
        )
        np.testing.assert_allclose(sharded[0], single[0], atol=1e-5,
                                   err_msg=mt)
        np.testing.assert_array_equal(sharded[1], single[1])

        p_single = save_predictions(
            setup.bundle.apply_fn, variables, loader, model_type=mt,
            data_forming=df,
        )
        p_sharded = save_predictions(
            setup.bundle.apply_fn, variables, loader, model_type=mt,
            data_forming=df, mesh=mesh,
        )
        np.testing.assert_allclose(p_sharded[0], p_single[0], atol=1e-5,
                                   err_msg=mt)


def test_concat_maybe_memmap_file_identical_to_np_save(tmp_path):
    """Streaming artifact assembly writes the same .npy bytes as
    np.save(np.concatenate(...)) for both concat axes."""
    import os

    from multimodal_uncertainty_tpu.evals.artifacts import concat_maybe_memmap

    rng = np.random.default_rng(0)
    parts = [rng.normal(size=(3, 5, 2)).astype(np.float32),
             rng.normal(size=(4, 5, 2)).astype(np.float32)]
    for axis, blocks in ((0, parts),
                         (1, [p.transpose(1, 0, 2) for p in parts])):
        ref = np.concatenate(blocks, axis=axis)
        ref_path = os.path.join(tmp_path, f"ref{axis}.npy")
        np.save(ref_path, ref)
        mm_path = os.path.join(tmp_path, f"mm{axis}.npy")
        out = concat_maybe_memmap(blocks, axis=axis, path=mm_path)
        np.testing.assert_array_equal(np.asarray(out), ref)
        assert open(mm_path, "rb").read() == open(ref_path, "rb").read()
    # no path -> plain concatenate
    np.testing.assert_array_equal(
        concat_maybe_memmap(parts, axis=0), np.concatenate(parts, axis=0)
    )


def test_concat_maybe_memmap_promotes_heterogeneous_dtypes(tmp_path):
    """ADVICE r3: mixed-dtype blocks must promote like np.concatenate
    (parts[0].dtype alone silently downcast later float64 blocks)."""
    from multimodal_uncertainty_tpu.evals.artifacts import concat_maybe_memmap

    a = np.arange(4, dtype=np.float32).reshape(2, 2)
    b = (np.arange(4, dtype=np.float64) + 0.123456789012345).reshape(2, 2)
    ref = np.concatenate([a, b], axis=0)
    out = concat_maybe_memmap([a, b], axis=0, path=str(tmp_path / "x.npy"))
    assert out.dtype == ref.dtype == np.float64
    np.testing.assert_array_equal(np.load(tmp_path / "x.npy"), ref)
