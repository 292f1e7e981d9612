#!/usr/bin/env python3
"""MMBT robustness sweep — CLI parity with the reference
``eval_mmbt_robustness.py`` (43 variants as one vmapped masked forward)."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args(parser):
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--phase", type=str, required=True)
    parser.add_argument("--batch_size", type=int, required=True)
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--use_gpu", action="store_true")
    parser.add_argument("--device", default=0, type=int)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--n_repeats", type=int, default=20)
    parser.add_argument("--dataset", type=str,
                        choices=["food101", "hateful-meme-dataset"],
                        default="hateful-meme-dataset")
    parser.add_argument("--num_image_embeds", type=int, default=3)
    parser.add_argument("--drop_img_percent", type=float, default=0.0)
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--datapath", type=str)
    parser.add_argument("--bert_model", type=str, default="bert-base-uncased",
                        choices=["bert-base-uncased", "bert-large-uncased"])
    parser.add_argument("--max_seq_len", type=int, default=512)
    parser.add_argument("--n_workers", type=int, default=0)
    parser.add_argument("--hidden", nargs="*", type=int, default=[])
    parser.add_argument("--hidden_sz", type=int, default=768)
    parser.add_argument("--img_embed_pool_type", type=str, default="avg",
                        choices=["max", "avg"])
    parser.add_argument("--img_hidden_sz", type=int, default=2048)
    parser.add_argument("--include_bn", type=int, default=True)
    parser.add_argument("--vocab_file", type=str, default=None)
    parser.add_argument("--sample_size", type=int, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="shrunken backbones for smoke tests")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard each sweep batch over this many chips "
                             "(weights replicated; ~Nx variant-samples/s)")


def main():
    parser = argparse.ArgumentParser(description="Eval Models")
    get_args(parser)
    args, remaining = parser.parse_known_args()
    assert remaining == [], remaining

    import jax

    from multimodal_uncertainty_tpu.data.food101 import get_food101
    from multimodal_uncertainty_tpu.evals.robustness_mmbt import mmbt_robustness_sweep
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.training.loop import resume_train_state
    from multimodal_uncertainty_tpu.zoo import setup_mmbt

    train, val, test, n_classes, vocab = get_food101(
        vocab_file=args.vocab_file,
        datapath=args.datapath,
        batch_size=args.batch_size,
        drop_img_percent=args.drop_img_percent,
        max_seq_len=args.max_seq_len,
        num_image_embeds=args.num_image_embeds,
        n_workers=args.n_workers,
        sample_size=args.sample_size,
    )
    # reference phase naming is train/dev/test; accept both aliases
    data = {"train": train, "val": val, "dev": val, "test": test}

    if args.tiny:
        import dataclasses as _dc

        bert_cfg = _dc.replace(
            BertConfig.base(), hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
        )
        resnet_layers = (1, 1, 1, 1)
    else:
        bert_cfg = (
            BertConfig.large()
            if args.bert_model == "bert-large-uncased"
            else BertConfig.base()
        )
        resnet_layers = (3, 8, 36, 3)

    mesh = None
    if args.data_parallel > 1:
        from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, model_parallel=1)
    setup = setup_mmbt(
        n_classes=n_classes,
        num_image_embeds=args.num_image_embeds,
        bert_config=bert_cfg,
        resnet_layers=resnet_layers,
        img_embed_pool_type=args.img_embed_pool_type,
        gradient_accumulation_steps=1,
        vocab_size=vocab.vocab_sz,
        seed_key=jax.random.key(args.seed),
        **({"attn_impl": "pallas_sharded"}
           if mesh is not None and jax.default_backend() == "tpu" else {}),
    )
    state = resume_train_state(setup.state, args.checkpoint_path)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    ckpt_name = args.checkpoint_path.split("/")[-1].split(".")[0]
    preds, labels = mmbt_robustness_sweep(
        setup.bundle.apply_fn,
        variables,
        data[args.phase],
        num_image_embeds=args.num_image_embeds,
        n_repeats=args.n_repeats,
        seed=args.seed,
        save_path=args.save_path,
        checkpoint_name=ckpt_name,
        phase=args.phase,
        mesh=mesh,
    )
    s, m, c = preds.shape
    print(
        "Gathered predictions of {} samples, {} variants, {} classes".format(s, m, c)
    )
    print("Gathered labels of {} samples".format(len(labels)))


if __name__ == "__main__":
    main()
