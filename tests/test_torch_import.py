"""Structural tests for the torch->flax weight converters.

BERT conversion is numerics-tested against HF torch in test_bert_parity.py;
here we validate the ResNet converter's key mapping/transposes and the full
MMBT pretrained merge (shapes + value round-trip) using a synthesized
torchvision-style state dict (torchvision itself is not installed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_uncertainty_tpu.models.bert import BertConfig
from multimodal_uncertainty_tpu.models.mmbt import MultimodalBertClf
from multimodal_uncertainty_tpu.models.torch_import import (
    convert_resnet_trunk,
    import_mmbt_pretrained,
)

LAYERS = (1, 1, 1, 1)


def _fake_torchvision_sd(rng, layers=LAYERS):
    """State dict with torchvision resnet naming for the given block counts."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.normal(size=(cout, cin, k, k)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for s, blocks in enumerate(layers):
        planes = (64, 128, 256, 512)[s]
        for j in range(blocks):
            t = f"layer{s + 1}.{j}"
            conv(f"{t}.conv1", planes, inplanes, 1)
            bn(f"{t}.bn1", planes)
            conv(f"{t}.conv2", planes, planes, 3)
            bn(f"{t}.bn2", planes)
            conv(f"{t}.conv3", planes * 4, planes, 1)
            bn(f"{t}.bn3", planes * 4)
            if j == 0:
                conv(f"{t}.downsample.0", planes * 4, inplanes, 1)
                bn(f"{t}.downsample.1", planes * 4)
            inplanes = planes * 4
    return sd


def test_resnet_converter_shapes_and_transpose():
    rng = np.random.default_rng(0)
    sd = _fake_torchvision_sd(rng)
    params, stats = convert_resnet_trunk(sd, LAYERS)
    # conv1: torch (64, 3, 7, 7) -> HWIO (7, 7, 3, 64)
    assert params["conv1"]["conv"]["kernel"].shape == (7, 7, 3, 64)
    np.testing.assert_array_equal(
        params["conv1"]["conv"]["kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0)
    )
    assert params["layer1_0"]["downsample_conv"]["conv"]["kernel"].shape == (
        1, 1, 64, 256,
    )
    np.testing.assert_array_equal(
        stats["layer4_0"]["bn3"]["bn"]["var"], sd["layer4.0.bn3.running_var"]
    )


def test_import_mmbt_pretrained_merges_and_runs():
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model = MultimodalBertClf(config=cfg, n_classes=3, resnet_layers=LAYERS,
                              attn_impl="xla")
    rng = np.random.default_rng(1)
    x = (
        jnp.asarray(rng.integers(0, 120, size=(2, 6))),
        jnp.ones((2, 6), jnp.int32),
        jnp.ones((2, 6), jnp.int32),
        jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
    )
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    resnet_sd = _fake_torchvision_sd(rng)
    merged = import_mmbt_pretrained(
        variables, resnet_sd=resnet_sd, resnet_layers=LAYERS
    )
    # pretrained conv actually landed
    got = merged["params"]["enc"]["img_encoder"]["model"]["conv1"]["conv"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(got), resnet_sd["conv1.weight"].transpose(2, 3, 1, 0)
    )
    # batch stats landed
    np.testing.assert_array_equal(
        np.asarray(
            merged["batch_stats"]["enc"]["img_encoder"]["model"]["bn1"]["bn"]["mean"]
        ),
        resnet_sd["bn1.running_mean"],
    )
    # model still runs with merged weights
    out = model.apply(
        {"params": merged["params"], "batch_stats": merged["batch_stats"]},
        x, train=False,
    )
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_import_shape_mismatch_raises():
    rng = np.random.default_rng(2)
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    model = MultimodalBertClf(config=cfg, n_classes=3, resnet_layers=LAYERS,
                              attn_impl="xla")
    x = (
        jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.ones((1, 4), jnp.int32), jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    sd = _fake_torchvision_sd(rng)
    # corrupt a conv width: model expects (7,7,3,64)
    sd["conv1.weight"] = rng.normal(size=(32, 3, 7, 7)).astype(np.float32)
    with pytest.raises(ValueError, match="pretrained shape"):
        import_mmbt_pretrained(variables, resnet_sd=sd, resnet_layers=LAYERS)
