"""Experiment configuration presets.

The reference carries vestigial gin files (``configs/*.gin`` — they configure
symbols from a sibling codebase and are never imported; SURVEY.md §2.7).
These dataclasses capture the *intent* of each file as runnable presets for
this framework's CLI/zoo API.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass
class TrainingConfig:
    """Base training preset (``configs/training.gin`` intent)."""

    framework: str = "flava"  # flava | mmbt | vilt
    dataset: str = "hateful-meme-dataset"
    model_type: str = "MIMO-shuffle-instance"
    batch_size: int = 128
    lr: float = 1e-4
    wd: float = 0.001
    n_epochs: int = 100
    patience: int = 10
    multimodal_num_attention_heads: int = 3
    multimodal_num_hidden_layers: int = 3
    dropout: float = 0.0
    clstoken: bool = False
    avg_pool: bool = False
    diversity: str = "none"
    diversity_coef: float = 0.0
    seed: int = 42
    # scaling
    data_parallel: int = 1
    model_parallel: int = 1
    bf16: bool = True

    def cli_args(self) -> list:
        args = [
            "--framework", self.framework,
            "--dataset", self.dataset,
            "--model_type", self.model_type,
            "--batch_size", str(self.batch_size),
            "--lr", str(self.lr),
            "--wd", str(self.wd),
            "--n_epochs", str(self.n_epochs),
            "--patience", str(self.patience),
            "--multimodal_num_attention_heads",
            str(self.multimodal_num_attention_heads),
            "--multimodal_num_hidden_layers",
            str(self.multimodal_num_hidden_layers),
            "--dropout", str(self.dropout),
            "--diversity", self.diversity,
            "--diversity_coef", str(self.diversity_coef),
            "--seed", str(self.seed),
            "--data_parallel", str(self.data_parallel),
            "--model_parallel", str(self.model_parallel),
        ]
        if self.clstoken:
            args.append("--clstoken")
        if self.avg_pool:
            args.append("--avg_pool")
        if self.bf16:
            args.append("--bf16")
        return args


def training() -> TrainingConfig:
    return TrainingConfig()


def training_guided() -> TrainingConfig:
    """``training_guided.gin`` intent (Bias_Mitigation_Strong): explicit
    diversity-encouraging training signal."""
    return dataclasses.replace(training(), diversity="guided", diversity_coef=0.1)


def training_random() -> TrainingConfig:
    """``training_random.gin`` intent (Bias_Mitigation_Random): undirected
    noise baseline matched in magnitude to the guided signal."""
    return dataclasses.replace(training(), diversity="random", diversity_coef=0.1)


@dataclasses.dataclass
class EvalConfig:
    """``eval.gin`` intent: robustness sweep over a trained checkpoint."""

    checkpoint: str = "model_best_val.pt"
    phase: str = "val"
    n_repeats: int = 20
    batch_size: int = 128


@dataclasses.dataclass
class RecordingConfig:
    """``recording.gin`` intent: per-epoch artifacts for timewise analysis."""

    save_every_epoch: bool = True
    dump_predictions: bool = True
    phases: Tuple[str, ...] = ("val", "test")


PRESETS = {
    "training": training,
    "training_guided": training_guided,
    "training_random": training_random,
}
