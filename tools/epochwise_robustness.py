#!/usr/bin/env python3
"""Record robustness sweeps for EVERY saved epoch checkpoint of a run.

The notebooks' timewise analyses (``epoch_wise_analysis`` in
``analysis/robustness_tables.py``, ported from
``notebooks/{food101,hatefulmeme}_robustness.py``) consume
``robustness_model_epoch_{e}_predictions_{phase}.npy`` per epoch — the
reference produced these by manually re-running its eval script per
checkpoint. This tool sweeps every ``model_epoch_*.pt`` in a run directory
(the RecordingConfig intent from ``configs/recording.gin``).

    python tools/epochwise_robustness.py --run_dir results/flava \
        --dataset hateful-meme-dataset --phase val --model_type MIMO-shuffle-instance
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--run_dir", required=True)
    parser.add_argument("--save_path", default=None,
                        help="artifact dir (default: run_dir)")
    parser.add_argument("--dataset", default="hateful-meme-dataset",
                        choices=["food101", "hateful-meme-dataset"])
    parser.add_argument("--phase", default="val")
    parser.add_argument("--model_type", default="Vanilla",
                        choices=["Vanilla", "MIMO-shuffle-instance", "MultiHead"])
    parser.add_argument("--multimodal_num_attention_heads", type=int, default=3)
    parser.add_argument("--multimodal_num_hidden_layers", type=int, default=3)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--n_repeats", type=int, default=20)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--epochs", nargs="*", type=int, default=None,
                        help="subset of epochs (default: all found)")
    args = parser.parse_args()

    import jax

    from multimodal_uncertainty_tpu.data.flava_encoded import (
        get_food101_flava,
        get_hatefulmeme,
    )
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies
    from multimodal_uncertainty_tpu.evals.robustness_transformer import (
        transformer_robustness_sweep,
    )
    from multimodal_uncertainty_tpu.training.loop import resume_train_state
    from multimodal_uncertainty_tpu.zoo import setup_flava

    datapath = os.path.join(os.environ["DATA_DIR"], args.dataset)
    if args.dataset == "food101":
        labels, _ = get_labels_and_frequencies(os.path.join(datapath, "train.jsonl"))
        n_classes = len(labels)
        train, val, test = get_food101_flava(
            datapath, batch_size=args.batch_size, seed=args.seed
        )
    else:
        n_classes = 2
        train, val, test = get_hatefulmeme(
            datapath, batch_size=args.batch_size, seed=args.seed
        )
    data = {"train": train, "val": val, "test": test}

    setup = setup_flava(
        model_type=args.model_type,
        n_classes=n_classes,
        multimodal_num_attention_heads=args.multimodal_num_attention_heads,
        multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
        seed_key=jax.random.key(args.seed),
    )

    ckpts = {}
    for path in glob.glob(os.path.join(args.run_dir, "model_epoch_*.pt")):
        m = re.match(r"model_epoch_(\d+)\.pt$", os.path.basename(path))
        if m:
            ckpts[int(m.group(1))] = path
    epochs = sorted(args.epochs or ckpts)
    save_path = args.save_path or args.run_dir

    def apply_fn(v, x, *, train, rngs, img_mask=None, txt_mask=None):
        return (
            setup.model.apply(v, x, train=train, img_mask=img_mask,
                              txt_mask=txt_mask),
            {},
        )

    for epoch in epochs:
        if epoch not in ckpts:
            print(f"epoch {epoch}: checkpoint missing, skipping")
            continue
        state = resume_train_state(setup.state, ckpts[epoch])
        preds, labels_ = transformer_robustness_sweep(
            apply_fn,
            {"params": state.params},
            data[args.phase],
            n_repeats=args.n_repeats,
            seed=args.seed,
            save_path=save_path,
            checkpoint_name=f"model_epoch_{epoch}",
            phase=args.phase,
        )
        print(f"epoch {epoch}: saved {preds.shape} -> {save_path}")


if __name__ == "__main__":
    main()
