"""Pretrained-weight import: torch state dicts -> flax param/batch-stat trees.

Supports the two pretrained backbones the reference relies on
(``src/mmbt.py:19,90``): torchvision ResNet-152 and BERT
(HF ``BertModel`` naming; the legacy ``pytorch_pretrained_bert`` naming
differs only by a ``bert.``/``gamma``/``beta`` prefix handled here).
This environment has no network, so callers pass a locally available
``.pth``/``.bin`` state dict.

Conventions: torch Linear weights are (out, in) -> transposed to (in, out);
torch conv weights (out, in, kh, kw) -> HWIO (kh, kw, in, out); BatchNorm
weight/bias -> scale/bias plus running mean/var -> batch_stats.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    # np.array copies: imported leaves must OWN their memory. A zero-copy
    # view of e.g. ``tensor.numpy()`` aliases live torch parameters, and on
    # CPU jax.device_put can keep that aliasing — a later in-place torch
    # optimizer step would then silently rewrite the "imported" jax params.
    return np.ascontiguousarray(np.array(w).T)


def _conv(w) -> np.ndarray:
    return np.ascontiguousarray(np.array(w).transpose(2, 3, 1, 0))


def _normalize_bert_keys(sd: Dict) -> Dict:
    """Strip 'bert.' prefixes and map gamma/beta -> weight/bias
    (pytorch_pretrained_bert legacy naming)."""
    out = {}
    for k, v in sd.items():
        k = k[len("bert."):] if k.startswith("bert.") else k
        k = k.replace(".gamma", ".weight").replace(".beta", ".bias")
        out[k] = np.array(v)
    return out


def convert_bert_encoder(sd: Dict, num_layers: int) -> Dict:
    """torch ``encoder.layer.{i}.*`` -> our BertEncoder param tree."""
    sd = _normalize_bert_keys(sd)
    layers = {}
    for i in range(num_layers):
        p = f"encoder.layer.{i}."
        layers[f"layer_{i}"] = {
            "self": {
                "query": {"kernel": _t(sd[p + "attention.self.query.weight"]),
                          "bias": np.array(sd[p + "attention.self.query.bias"])},
                "key": {"kernel": _t(sd[p + "attention.self.key.weight"]),
                        "bias": np.array(sd[p + "attention.self.key.bias"])},
                "value": {"kernel": _t(sd[p + "attention.self.value.weight"]),
                          "bias": np.array(sd[p + "attention.self.value.bias"])},
            },
            "attn_output_dense": {
                "kernel": _t(sd[p + "attention.output.dense.weight"]),
                "bias": np.array(sd[p + "attention.output.dense.bias"]),
            },
            "attn_output_LayerNorm": {
                "weight": np.array(sd[p + "attention.output.LayerNorm.weight"]),
                "bias": np.array(sd[p + "attention.output.LayerNorm.bias"]),
            },
            "intermediate_dense": {
                "kernel": _t(sd[p + "intermediate.dense.weight"]),
                "bias": np.array(sd[p + "intermediate.dense.bias"]),
            },
            "output_dense": {
                "kernel": _t(sd[p + "output.dense.weight"]),
                "bias": np.array(sd[p + "output.dense.bias"]),
            },
            "output_LayerNorm": {
                "weight": np.array(sd[p + "output.LayerNorm.weight"]),
                "bias": np.array(sd[p + "output.LayerNorm.bias"]),
            },
        }
    return layers


def convert_bert_embeddings(sd: Dict) -> Tuple[Dict, Dict]:
    """Returns (tables, layernorm): embeddings tables + their LayerNorm."""
    sd = _normalize_bert_keys(sd)
    tables = {
        "word_embeddings": np.array(sd["embeddings.word_embeddings.weight"]),
        "position_embeddings": np.array(sd["embeddings.position_embeddings.weight"]),
        "token_type_embeddings": np.array(
            sd["embeddings.token_type_embeddings.weight"]
        ),
    }
    ln = {
        "weight": np.array(sd["embeddings.LayerNorm.weight"]),
        "bias": np.array(sd["embeddings.LayerNorm.bias"]),
    }
    return tables, ln


def convert_bert_pooler(sd: Dict) -> Dict:
    sd = _normalize_bert_keys(sd)
    return {
        "dense": {
            "kernel": _t(sd["pooler.dense.weight"]),
            "bias": np.array(sd["pooler.dense.bias"]),
        }
    }


def convert_resnet_trunk(sd: Dict, layers=(3, 8, 36, 3)) -> Tuple[Dict, Dict]:
    """torchvision resnet sd -> (params, batch_stats) of ResNetTrunkTV."""
    params: Dict = {}
    stats: Dict = {}

    def put_conv(dst_p, dst_s, name, tkey):
        dst_p[name] = {"conv": {"kernel": _conv(sd[tkey + ".weight"])}}

    def put_bn(dst_p, dst_s, name, tkey):
        dst_p[name] = {
            "bn": {
                "scale": np.array(sd[tkey + ".weight"]),
                "bias": np.array(sd[tkey + ".bias"]),
            }
        }
        dst_s[name] = {
            "bn": {
                "mean": np.array(sd[tkey + ".running_mean"]),
                "var": np.array(sd[tkey + ".running_var"]),
            }
        }

    put_conv(params, stats, "conv1", "conv1")
    put_bn(params, stats, "bn1", "bn1")
    for s, blocks in enumerate(layers):
        for j in range(blocks):
            name = f"layer{s + 1}_{j}"
            t = f"layer{s + 1}.{j}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in (1, 2, 3):
                put_conv(bp, bs, f"conv{ci}", f"{t}.conv{ci}")
                put_bn(bp, bs, f"bn{ci}", f"{t}.bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                put_conv(bp, bs, "downsample_conv", f"{t}.downsample.0")
                put_bn(bp, bs, "downsample_bn", f"{t}.downsample.1")
            params[name] = bp
            stats[name] = bs
    return params, stats


def import_mmbt_pretrained(
    flax_variables: Dict,
    bert_sd: Dict = None,
    resnet_sd: Dict = None,
    num_layers: int = 12,
    resnet_layers=(3, 8, 36, 3),
) -> Dict:
    """Merge pretrained torch weights into an initialized MMBT variable tree
    (random init stays where no pretrained source is given, e.g. clf and
    img_embeddings projection — matching the reference which trains those
    from scratch)."""
    import copy

    v = copy.deepcopy(
        {
            "params": flax_variables["params"],
            **(
                {"batch_stats": flax_variables["batch_stats"]}
                if "batch_stats" in flax_variables
                else {}
            ),
        }
    )
    enc_p = v["params"]["enc"]
    if bert_sd is not None:
        tables, ln = convert_bert_embeddings(bert_sd)
        enc_p["txt_embeddings"].update(tables)
        # LN params live with the tables and are shared by text & image
        # embedding paths (reference shares the module, src/mmbt.py:55).
        enc_p["txt_embeddings"]["ln_weight"] = ln["weight"]
        enc_p["txt_embeddings"]["ln_bias"] = ln["bias"]
        enc_p["encoder"].update(convert_bert_encoder(bert_sd, num_layers))
        enc_p["pooler"].update(convert_bert_pooler(bert_sd))
    if resnet_sd is not None:
        rp, rs = convert_resnet_trunk(resnet_sd, resnet_layers)
        enc_p["img_encoder"]["model"].update(rp)
        v["batch_stats"]["enc"]["img_encoder"]["model"].update(rs)

    _check_shapes(flax_variables["params"], v["params"], "params")
    if "batch_stats" in flax_variables:
        _check_shapes(
            flax_variables["batch_stats"], v["batch_stats"], "batch_stats"
        )
    return v


def convert_vilt(sd: Dict, num_layers: int = 12) -> Dict:
    """HF torch ``ViltForImagesAndTextClassification`` state dict ->
    our flax param tree (``models/vilt.py``).

    Name map (HF -> ours):
      vilt.embeddings.text_embeddings.{word,position,token_type}_embeddings
        -> vilt/{word,position,token_type}_embeddings
      vilt.embeddings.text_embeddings.LayerNorm -> vilt/emb_LayerNorm
      vilt.embeddings.token_type_embeddings (modality table)
        -> vilt/modality_type_embeddings
      vilt.embeddings.cls_token / position_embeddings
        -> vilt/image_cls / vilt/image_position_embeddings
      vilt.embeddings.patch_embeddings.projection -> vilt/patch_embed (HWIO)
      vilt.encoder.layer.{i}.attention.attention.{q,k,v} -> packed block_{i}/qkv
      vilt.encoder.layer.{i}.attention.output.dense -> block_{i}/proj
      vilt.encoder.layer.{i}.layernorm_{before,after} -> block_{i}/ln_{1,2}
      vilt.encoder.layer.{i}.{intermediate,output}.dense -> block_{i}/{fc1,fc2}
      vilt.layernorm -> vilt/ln_post ; vilt.pooler.dense -> vilt/pooler
      classifier.{0,1,3} -> cls_fc / cls_ln / cls_out
    """
    sd = {k: np.array(v) for k, v in sd.items()}
    e = "vilt.embeddings."
    vilt: Dict = {
        "word_embeddings": sd[e + "text_embeddings.word_embeddings.weight"],
        "position_embeddings": sd[e + "text_embeddings.position_embeddings.weight"],
        "token_type_embeddings": sd[
            e + "text_embeddings.token_type_embeddings.weight"
        ],
        "emb_LayerNorm": {
            "weight": sd[e + "text_embeddings.LayerNorm.weight"],
            "bias": sd[e + "text_embeddings.LayerNorm.bias"],
        },
        "modality_type_embeddings": sd[e + "token_type_embeddings.weight"],
        "image_cls": sd[e + "cls_token"],
        "image_position_embeddings": sd[e + "position_embeddings"][0],
        "patch_embed": {
            "kernel": _conv(sd[e + "patch_embeddings.projection.weight"]),
            "bias": sd[e + "patch_embeddings.projection.bias"],
        },
    }
    for i in range(num_layers):
        p = f"vilt.encoder.layer.{i}."
        qkv_w = np.concatenate(
            [
                _t(sd[p + f"attention.attention.{n}.weight"])
                for n in ("query", "key", "value")
            ],
            axis=1,
        )
        qkv_b = np.concatenate(
            [
                sd[p + f"attention.attention.{n}.bias"]
                for n in ("query", "key", "value")
            ]
        )
        vilt[f"block_{i}"] = {
            "ln_1": {
                "weight": sd[p + "layernorm_before.weight"],
                "bias": sd[p + "layernorm_before.bias"],
            },
            "qkv": {"kernel": qkv_w, "bias": qkv_b},
            "proj": {
                "kernel": _t(sd[p + "attention.output.dense.weight"]),
                "bias": sd[p + "attention.output.dense.bias"],
            },
            "ln_2": {
                "weight": sd[p + "layernorm_after.weight"],
                "bias": sd[p + "layernorm_after.bias"],
            },
            "fc1": {
                "kernel": _t(sd[p + "intermediate.dense.weight"]),
                "bias": sd[p + "intermediate.dense.bias"],
            },
            "fc2": {
                "kernel": _t(sd[p + "output.dense.weight"]),
                "bias": sd[p + "output.dense.bias"],
            },
        }
    vilt["ln_post"] = {
        "weight": sd["vilt.layernorm.weight"],
        "bias": sd["vilt.layernorm.bias"],
    }
    vilt["pooler"] = {
        "kernel": _t(sd["vilt.pooler.dense.weight"]),
        "bias": sd["vilt.pooler.dense.bias"],
    }
    params: Dict = {"vilt": vilt}
    # Classification head exists only on fine-tuned checkpoints; the
    # reference's dandelin/vilt-b32-mlm has none (head trains from scratch).
    if "classifier.0.weight" in sd:
        params["cls_fc"] = {
            "kernel": _t(sd["classifier.0.weight"]),
            "bias": sd["classifier.0.bias"],
        }
        params["cls_ln"] = {
            "weight": sd["classifier.1.weight"],
            "bias": sd["classifier.1.bias"],
        }
        params["cls_out"] = {
            "kernel": _t(sd["classifier.3.weight"]),
            "bias": sd["classifier.3.bias"],
        }
    return params


def import_vilt_pretrained(
    flax_variables: Dict, sd: Dict, num_layers: int = 12
) -> Dict:
    """Merge a pretrained HF ViLT state dict into an initialized variable
    tree (random init stays for parts absent from the checkpoint, e.g. the
    classifier head on mlm checkpoints). Accepts both bare ``ViltModel``
    dicts (keys start 'embeddings.') and classification dicts ('vilt.')."""
    import copy

    if not any(k.startswith("vilt.") for k in sd):
        sd = {f"vilt.{k}" if not k.startswith("classifier.") else k: v
              for k, v in sd.items()}
    v = {"params": copy.deepcopy(flax_variables["params"])}
    converted = convert_vilt(sd, num_layers)

    def merge(dst, src):
        for k, s in src.items():
            if isinstance(s, dict):
                merge(dst[k], s)
            else:
                dst[k] = s

    merge(v["params"], converted)
    _check_shapes(flax_variables["params"], v["params"], "params")
    return v


def _check_shapes(template: Dict, merged: Dict, label: str, path: str = "") -> None:
    """Merged pretrained weights must match the model's shapes exactly —
    catches depth/width config mismatches at import time instead of at the
    first apply."""
    for key, t_val in template.items():
        sub = f"{path}/{key}"
        if key not in merged:
            raise KeyError(f"{label}{sub} missing after pretrained merge")
        m_val = merged[key]
        if isinstance(t_val, dict):
            _check_shapes(t_val, m_val, label, sub)
        else:
            t_shape = tuple(np.shape(t_val))
            m_shape = tuple(np.shape(m_val))
            if t_shape != m_shape:
                raise ValueError(
                    f"{label}{sub}: pretrained shape {m_shape} != model "
                    f"shape {t_shape} (wrong config for this checkpoint?)"
                )
