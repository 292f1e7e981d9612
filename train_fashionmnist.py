#!/usr/bin/env python3
"""FashionMNIST MIMO training — CLI parity with the reference
``train_fashionmnist.py`` (flags at ``:22-42``). Fixes the reference's
missing scheduler_metric kwarg (SURVEY.md §3.3) and adds --synthetic for
hermetic runs without the dataset images."""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def get_args(parser):
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--wd", type=float, default=0.001)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--n_epochs", type=int, default=100)
    parser.add_argument("--model_type", type=str, default="Vanilla",
                        choices=["Vanilla", "MIMO-shuffle-instance",
                                 "MIMO-shuffle-view", "MultiHead",
                                 "MIMO-shuffle-all", "single-model-weight-sharing"])
    parser.add_argument("--use_gpu", action="store_true")
    parser.add_argument("--device", default=0, type=int)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--keep_epoch_ckpts", type=int, default=None,
                        help="retain only the newest N model_epoch_*.pt "
                             "(best/last never pruned; default: keep all)")
    parser.add_argument("--multimodal_num_attention_heads", type=int, default=3)
    parser.add_argument("--multimodal_num_hidden_layers", type=int, default=3)
    parser.add_argument("--transformer", action="store_true")
    parser.add_argument("--warmup", type=float, default=0.1)
    parser.add_argument("--dropout", type=float, default=0)
    # TPU-native extras
    parser.add_argument("--synthetic", action="store_true",
                        help="use the synthetic FashionMNIST stand-in")
    parser.add_argument("--sample_size", type=int, default=None)
    parser.add_argument("--attn_impl", type=str, default="auto")
    parser.add_argument("--diversity", type=str, default="none",
                        choices=["none", "guided", "random"])
    parser.add_argument("--diversity_coef", type=float, default=0.1)
    parser.add_argument("--ece", action="store_true",
                        help="record val/test expected calibration error "
                             "per epoch in history.csv (north-star metric)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write an XLA device trace of one post-compile "
                             "epoch here (jax.profiler); inspect with "
                             "tools/trace_report.py or TensorBoard")
    parser.add_argument("--profile_epoch", type=int, default=2,
                        help="which epoch to trace (default 2: epoch 1 "
                             "pays compilation)")


def main():
    parser = argparse.ArgumentParser(description="Train Models")
    get_args(parser)
    args, remaining = parser.parse_known_args()
    assert remaining == [], remaining

    import jax

    from multimodal_uncertainty_tpu.data.fmnist import get_fmnist
    from multimodal_uncertainty_tpu.training.loop import (
        construct_default_callbacks,
        load_history,
        resume_midtrain_state,
        resume_train_state,
    )
    from multimodal_uncertainty_tpu.training.preemption import PreemptionGuard
    from multimodal_uncertainty_tpu.training.trainer import Trainer
    from multimodal_uncertainty_tpu.utils.seeding import set_seed
    from multimodal_uncertainty_tpu.zoo import setup_fashionmnist

    # latch SIGTERM before the slow import/compile phase (see train.py)
    guard = PreemptionGuard().install()

    # console transcript -> run directory (see utils/logging_utils.py)
    from multimodal_uncertainty_tpu.utils.logging_utils import TeeLog

    os.makedirs(args.save_path, exist_ok=True)
    TeeLog(os.path.join(args.save_path, "out.log")).install()

    root_key = set_seed(args.seed)

    train, valid, _ = get_fmnist(
        datapath=os.environ.get("DATA_DIR"),
        batch_size=args.batch_size,
        download=True,
        shuffle=True,
        seed=args.seed,
        sample_size=args.sample_size,
        synthetic=args.synthetic,
    )

    setup = setup_fashionmnist(
        model_type=args.model_type,
        transformer=args.transformer,
        lr=args.lr,
        wd=args.wd,
        momentum=args.momentum,
        warmup=args.warmup,
        total_steps=len(train) * args.n_epochs,
        multimodal_num_attention_heads=args.multimodal_num_attention_heads,
        multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
        dropout=args.dropout,
        diversity=args.diversity,
        diversity_coef=args.diversity_coef,
        seed_key=root_key,
        attn_impl=args.attn_impl,
    )

    os.makedirs(args.save_path, exist_ok=True)
    history_csv_path = os.path.join(args.save_path, "history.csv")
    midtrain_path = os.path.join(args.save_path, "model_midtrain.pt")
    state = setup.state
    resume_mid = None
    if args.resume and not (
        os.path.exists(midtrain_path)
        or os.path.exists(os.path.join(args.save_path, "model_last_epoch.pt"))
    ):
        # preempted before any checkpoint landed: start fresh, don't crash
        logging.getLogger(__name__).warning(
            "--resume: no checkpoint in %s; starting fresh", args.save_path
        )
        args.resume = False
    if args.resume:
        H = (
            load_history(args.save_path)
            if os.path.exists(history_csv_path)
            else {"epoch": []}
        )
        epoch_start = len(H["epoch"]) + 1
        if os.path.exists(midtrain_path):
            state, resume_mid = resume_midtrain_state(
                state, midtrain_path, scheduler=setup.plateau
            )
            if int(resume_mid["epoch"]) != epoch_start:  # stale mid file
                resume_mid = None
                state = resume_train_state(
                    setup.state,
                    os.path.join(args.save_path, "model_last_epoch.pt"),
                    scheduler=setup.plateau,
                )
        else:
            state = resume_train_state(
                state, os.path.join(args.save_path, "model_last_epoch.pt"),
                scheduler=setup.plateau,
            )
    else:
        H = {}
        if os.path.exists(history_csv_path):
            os.remove(history_csv_path)
        epoch_start = 1

    callbacks = construct_default_callbacks(
        H, args.save_path, checkpoint_monitor="val_acc",
        keep_epoch_ckpts=args.keep_epoch_ckpts,
    )
    for clbk in callbacks:
        clbk.set_save_path(args.save_path)

    trainer = Trainer(
        setup.bundle,
        setup.optimizer,
        state,
        rng=jax.random.fold_in(root_key, 1),
        plateau_scheduler=setup.plateau,
        size_fn=setup.size_fn,
        verbose=True,
    )
    trainer.train_loop(
        train,
        valid_generator=valid,
        test_generator=valid,
        steps_per_epoch=len(train),
        validation_steps=len(valid),
        test_steps=len(valid),
        # reference quirk preserved: trains n_epochs - 1 epochs (:184)
        epochs=args.n_epochs - 1,
        callbacks=callbacks,
        patience=args.patience,
        epoch_start=epoch_start,
        scheduler_step_on="epoch",
        scheduler_metric=setup.scheduler_metric,
        auc=False,
        ece=args.ece,
        profile_dir=args.profile_dir,
        profile_epoch=args.profile_epoch,
        preemption=guard,
        midtrain_path=midtrain_path,
        resume_mid=resume_mid,
    )


if __name__ == "__main__":
    main()
