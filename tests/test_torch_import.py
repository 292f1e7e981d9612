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


def _torch_resnet(layers=(1, 1, 1, 1)):
    """torchvision.models.ResNet(Bottleneck, layers) replica with identical
    structure AND state-dict key names (torchvision absent from this env)."""
    import torch
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            res = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + res)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            for i, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)
            ):
                setattr(self, f"layer{i + 1}",
                        self._make_layer(Bottleneck, planes, blocks,
                                         1 if i == 0 else 2))

        def _make_layer(self, block, planes, blocks, stride):
            import torch.nn as tnn

            downsample = None
            if stride != 1 or self.inplanes != planes * 4:
                downsample = tnn.Sequential(
                    tnn.Conv2d(self.inplanes, planes * 4, 1, stride,
                               bias=False),
                    tnn.BatchNorm2d(planes * 4),
                )
            mods = [block(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes * 4
            mods += [block(self.inplanes, planes) for _ in range(blocks - 1)]
            return tnn.Sequential(*mods)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for i in range(4):
                x = getattr(self, f"layer{i + 1}")(x)
            return x

    return Net()


def test_resnet_trunk_matches_torch_numerics():
    """Converted torch weights reproduce torch activations EXACTLY,
    including the stride-2 stages (guards the torch-style conv padding:
    XLA 'SAME' would shift windows by one pixel there)."""
    import torch

    from multimodal_uncertainty_tpu.models.resnet_tv import ResNetTrunkTV

    torch.manual_seed(0)
    tm = _torch_resnet((1, 1, 1, 1))
    # non-trivial BN running stats so eval-mode normalization is exercised
    tm.train()
    with torch.no_grad():
        tm(torch.randn(4, 3, 64, 64))
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    params, stats = convert_resnet_trunk(sd, layers=(1, 1, 1, 1))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)

    trunk = ResNetTrunkTV((1, 1, 1, 1))
    out = trunk.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_imported_leaves_own_their_memory():
    """Regression: importers must COPY tensors, not view them. Converting a
    live ``tensor.numpy()`` state dict zero-copy would alias torch parameter
    storage — a later in-place torch optimizer step silently rewrites the
    "imported" jax params (observed: ViLT AdamW golden diverging at step 0
    because the torch replica stepped first)."""
    rng = np.random.default_rng(3)
    sd = _fake_torchvision_sd(rng)
    params, stats = convert_resnet_trunk(sd, LAYERS)
    before = np.array(params["conv1"]["conv"]["kernel"])
    var_before = np.array(stats["layer4_0"]["bn3"]["bn"]["var"])
    # in-place mutation of the source state dict (what torch.optim does)
    sd["conv1.weight"] += 1.0
    sd["layer4.0.bn3.running_var"] *= 5.0
    np.testing.assert_array_equal(params["conv1"]["conv"]["kernel"], before)
    np.testing.assert_array_equal(stats["layer4_0"]["bn3"]["bn"]["var"], var_before)
