#!/usr/bin/env python3
"""FashionMNIST per-head prediction dump — CLI parity with the reference
``eval_prediction_saving.py``."""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args(parser):
    parser.add_argument("--checkpoint_path", type=str, required=True)
    parser.add_argument("--model_type", type=str, default="Vanilla",
                        choices=["Vanilla", "MIMO-shuffle-instance",
                                 "MIMO-shuffle-view", "MultiHead",
                                 "MIMO-shuffle-all", "single-model-weight-sharing"])
    parser.add_argument("--use_gpu", action="store_true")
    parser.add_argument("--device", default=0, type=int)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="shard each eval batch over this many "
                             "chips (weights replicated)")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--multimodal_num_attention_heads", type=int, default=3)
    parser.add_argument("--multimodal_num_hidden_layers", type=int, default=3)
    parser.add_argument("--transformer", action="store_true")
    parser.add_argument("--dropout", type=float, default=0)
    parser.add_argument("--synthetic", action="store_true")


def main():
    parser = argparse.ArgumentParser(description="Eval Models")
    get_args(parser)
    args, remaining = parser.parse_known_args()
    assert remaining == [], remaining

    import jax

    from multimodal_uncertainty_tpu.data.fmnist import get_fmnist
    from multimodal_uncertainty_tpu.evals.prediction_saving import save_predictions
    from multimodal_uncertainty_tpu.ops.data_forming import data_forming_func
    from multimodal_uncertainty_tpu.training.loop import resume_train_state
    from multimodal_uncertainty_tpu.zoo import setup_fashionmnist

    setup = setup_fashionmnist(
        model_type=args.model_type,
        transformer=args.transformer,
        multimodal_num_attention_heads=args.multimodal_num_attention_heads,
        multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
        dropout=args.dropout,
        seed_key=jax.random.key(args.seed),
    )
    _, valid, _ = get_fmnist(
        datapath=os.environ.get("DATA_DIR"),
        batch_size=args.batch_size,
        download=True,
        shuffle=True,
        seed=args.seed,
        synthetic=args.synthetic,
    )
    print("Loading Checkpoint from {}".format(args.checkpoint_path))
    state = resume_train_state(setup.state, args.checkpoint_path)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    mesh = None
    if args.data_parallel > 1:
        from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.data_parallel, model_parallel=1)
    ckpt_name = args.checkpoint_path.split("/")[-1].split(".")[0]
    outputs, labels = save_predictions(
        setup.bundle.apply_fn,
        variables,
        valid,
        model_type=args.model_type,
        data_forming=lambda k, x, y, phase: data_forming_func(
            k, x, y, phase=phase, model_type=args.model_type
        ),
        save_path=args.save_path,
        checkpoint_name=ckpt_name,
        mesh=mesh,
    )
    s, m, c = outputs.shape
    print(f"Gathered predictions of {s} samples, {m} views, {c} classes")
    print(f"Gathered labels of {len(labels)} samples")


if __name__ == "__main__":
    main()
