#!/usr/bin/env python3
"""FLAVA-fusion robustness sweep — CLI parity with the reference
``eval_transformer_robustness.py`` (43 variants as one vmapped forward;
fixes the reference's stale dataset-function names at :60-64 and the
s_txt-from-img bug at :119)."""
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
    parser.add_argument("--model_type", type=str, default="Vanilla",
                        choices=["Vanilla", "MIMO-shuffle-instance", "MultiHead"])
    parser.add_argument("--use_gpu", action="store_true")
    parser.add_argument("--device", default=0, type=int)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--n_repeats", type=int, default=20)
    parser.add_argument("--multimodal_num_attention_heads", type=int, default=3)
    parser.add_argument("--multimodal_num_hidden_layers", type=int, default=3)
    parser.add_argument("--dataset", type=str,
                        choices=["food101", "hateful-meme-dataset"],
                        default="hateful-meme-dataset")
    parser.add_argument("--sample_size", type=int, default=None)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard each sweep batch over this many chips "
                             "(weights replicated; ~Nx variant-samples/s)")


def main():
    parser = argparse.ArgumentParser(description="Eval Models")
    get_args(parser)
    args, remaining = parser.parse_known_args()
    assert remaining == [], remaining

    import jax

    from multimodal_uncertainty_tpu.data.flava_encoded import get_dataset_flava
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies
    from multimodal_uncertainty_tpu.evals.robustness_transformer import (
        transformer_robustness_sweep,
    )
    from multimodal_uncertainty_tpu.training.loop import resume_train_state
    from multimodal_uncertainty_tpu.zoo import setup_flava

    datapath = os.path.join(os.environ["DATA_DIR"], args.dataset)
    if args.dataset == "food101":
        args.labels, _ = get_labels_and_frequencies(
            os.path.join(datapath, "train.jsonl")
        )
        n_classes = len(args.labels)
        args.error_cases_remover = False
        args.name_extractor = lambda x: x.split(".")[0]
    else:
        args.labels = list(range(2))
        n_classes = 2
        args.error_cases_remover = True
        args.name_extractor = lambda x: x.split("/")[-1].split(".")[0]

    train, val, test = get_dataset_flava(args, datapath)
    # reference phase naming is train/dev/test (dev.jsonl, notebooks load
    # *_dev.npy artifacts); accept 'val' as an alias for the same split
    data = {"train": train, "val": val, "dev": val, "test": test}

    mesh = None
    if args.data_parallel > 1:
        from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, model_parallel=1)
    setup = setup_flava(
        model_type=args.model_type,
        n_classes=n_classes,
        multimodal_num_attention_heads=args.multimodal_num_attention_heads,
        multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
        seed_key=jax.random.key(args.seed),
        # sharded kernel entry points partition under GSPMD on meshes
        **({"attn_impl": "pallas_sharded"}
           if mesh is not None and jax.default_backend() == "tpu" else {}),
    )
    state = resume_train_state(setup.state, args.checkpoint_path)
    variables = {"params": state.params}

    def apply_fn(v, x, *, train, rngs, img_mask=None, txt_mask=None):
        return (
            setup.model.apply(v, x, train=train, img_mask=img_mask,
                              txt_mask=txt_mask),
            {},
        )

    ckpt_name = args.checkpoint_path.split("/")[-1].split(".")[0]
    preds, labels = transformer_robustness_sweep(
        apply_fn,
        variables,
        data[args.phase],
        n_repeats=args.n_repeats,
        seed=args.seed,
        save_path=args.save_path,
        checkpoint_name=ckpt_name,
        phase=args.phase,
        mesh=mesh,
    )
    s, m, k, c = preds.shape
    print(
        "Gathered predictions of {} samples, {} variants, {} heads, {} classes".format(
            s, m, k, c
        )
    )
    print("Gathered labels of {} samples".format(len(labels)))


if __name__ == "__main__":
    main()
