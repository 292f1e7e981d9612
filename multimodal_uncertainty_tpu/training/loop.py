"""Default callback construction + history.csv persistence + resume helpers.

Bit-compatible with the reference's experiment-record contract
(``src/training_loop.py``): per-epoch history rows appended to an in-memory
dict ``H`` and flushed to ``history.csv`` (pandas), best-val checkpoint
``model_best_val.pt``, per-epoch ``model_epoch_{e}.pt`` + rolling
``model_last_epoch.pt``. Notebooks consuming history.csv port unchanged.
"""
from __future__ import annotations

import logging
import os
from functools import partial

import numpy as np
import pandas as pd

from multimodal_uncertainty_tpu.training.callbacks import (
    Callback,
    LambdaCallback,
    ModelCheckpoint,
)
from multimodal_uncertainty_tpu.training.checkpoint import (
    load_weights,
    restore_into,
    save_weights,
)

logger = logging.getLogger(__name__)

TYPES_TO_SAVE_IN_CSV = (int, float, complex, np.integer, np.floating, str)


def _append_to_history_csv(epoch, logs, H):
    for key, value in logs.items():
        H.setdefault(key, []).append(value)


def _save_history_csv(epoch, logs, save_path, H):
    out = "".join(
        f"{key}={value}\t"
        for key, value in logs.items()
        if isinstance(value, TYPES_TO_SAVE_IN_CSV)
    )
    logger.info(out)
    logger.info("Saving history to %s", os.path.join(save_path, "history.csv"))
    H_tosave = {
        key: value
        for key, value in H.items()
        if value and isinstance(value[-1], TYPES_TO_SAVE_IN_CSV)
    }
    pd.DataFrame(H_tosave).to_csv(
        os.path.join(save_path, "history.csv"), index=False
    )


def construct_default_callbacks(
    H, save_path, checkpoint_monitor="val_acc", keep_epoch_ckpts=None
):
    """Standard callback set (reference ``src/training_loop.py:23-47``).

    ``keep_epoch_ckpts=N`` retains only the newest N ``model_epoch_{e}.pt``
    files (``model_best_val.pt`` / ``model_last_epoch.pt`` are never
    pruned). Default ``None`` keeps every epoch — reference parity; long
    production runs set N to bound disk."""
    callbacks = [
        LambdaCallback(on_epoch_end=partial(_append_to_history_csv, H=H)),
        LambdaCallback(
            on_epoch_end=partial(_save_history_csv, save_path=save_path, H=H)
        ),
        ModelCheckpoint(
            monitor=checkpoint_monitor,
            save_best_only=True,
            mode="max",
            filepath=os.path.join(save_path, "model_best_val.pt"),
        ),
    ]

    class _SaveEveryEpoch(Callback):
        def on_epoch_end(self, epoch, logs):
            logger.info("Saving model from epoch %s", epoch)
            variables, opt_state = self.trainer.checkpointable_state()
            save_weights(
                variables, opt_state, os.path.join(save_path, f"model_epoch_{epoch}.pt")
            )
            save_weights(
                variables, opt_state, os.path.join(save_path, "model_last_epoch.pt")
            )
            if keep_epoch_ckpts is not None:
                # on the writer queue: runs after this epoch's async saves
                from multimodal_uncertainty_tpu.training.checkpoint import (
                    enqueue_after_writes,
                )

                enqueue_after_writes(
                    partial(prune_epoch_checkpoints, save_path, keep_epoch_ckpts)
                )

    callbacks.append(_SaveEveryEpoch())
    return callbacks


def prune_epoch_checkpoints(save_path: str, keep: int) -> list:
    """Delete all but the newest ``keep`` ``model_epoch_{e}.pt`` files
    (by epoch number). Returns the removed paths."""
    import re

    found = []
    for name in os.listdir(save_path):
        m = re.fullmatch(r"model_epoch_(\d+)\.pt", name)
        if m:
            found.append((int(m.group(1)), name))
    removed = []
    for _, name in sorted(found)[: max(0, len(found) - keep)]:
        path = os.path.join(save_path, name)
        os.remove(path)
        removed.append(path)
    return removed


# keep the reference's name importable
_construct_default_callbacks = construct_default_callbacks


class OrbaxEpochCheckpoint(Callback):
    """Epoch-end checkpointing through the orbax backend
    (``training/orbax_io.py``): sharding-aware directory saves, so a
    TP-sharded multi-host state checkpoints without ever being gathered
    onto one process — the regime where the msgpack path's device_get
    cannot work. Mirrors the default callbacks' contract: one save per
    epoch under ``{directory}/{epoch}``, best-val tracked in
    ``best.json``, optional retention pruning (the best epoch is never
    pruned). The plateau scheduler's decision state rides along in the
    checkpoint's ``extra`` blob.

    On multi-host, attach this callback on EVERY process (orbax saves are
    collective); pass ``write_meta=False`` on non-primary processes so
    best.json has a single writer.
    """

    def __init__(self, directory, monitor="val_acc", mode="max", keep=None,
                 write_meta=True):
        self.directory = directory
        self.monitor = monitor
        self.mode = mode
        self.keep = keep
        self.write_meta = write_meta
        self.best = None
        self.best_epoch = None

    def _meta_path(self):
        return os.path.join(self.directory, "best.json")

    def on_train_begin(self, logs):
        # resuming: pick up the previous best so a resumed run doesn't
        # clobber best.json with a worse epoch
        import json

        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                meta = json.load(f)
            self.best = meta.get(self.monitor)
            self.best_epoch = meta.get("best_epoch")

    def on_train_end(self, logs):
        # saves are async (orbax finalizes a tmp-dir rename in the
        # background); make the last epoch durable before the process can
        # exit — otherwise a *.orbax-checkpoint-tmp is left behind and the
        # run resumes one epoch early
        from multimodal_uncertainty_tpu.training.orbax_io import _checkpointer

        _checkpointer().wait_until_finished()

    def on_epoch_end(self, epoch, logs):
        import json
        import shutil

        from multimodal_uncertainty_tpu.training.orbax_io import (
            save_train_state,
        )

        extra = None
        sched = getattr(self.trainer, "plateau_scheduler", None)
        if sched is not None:
            extra = sched.state_dict()
        save_train_state(self.trainer.state, self.directory, epoch,
                         wait=False, extra=extra)

        val = logs.get(self.monitor)
        improved = val is not None and (
            self.best is None
            or (val > self.best if self.mode == "max" else val < self.best)
        )
        if improved:
            self.best, self.best_epoch = float(val), int(epoch)
            if self.write_meta:
                tmp = self._meta_path() + ".tmp"
                with open(tmp, "w") as f:
                    json.dump(
                        {"best_epoch": epoch, self.monitor: float(val)}, f
                    )
                os.replace(tmp, self._meta_path())

        if self.keep is not None:
            from multimodal_uncertainty_tpu.training.orbax_io import (
                _checkpointer,
            )

            _checkpointer().wait_until_finished()  # never prune in-flight
            epochs = sorted(
                int(d) for d in os.listdir(self.directory) if d.isdigit()
            )
            prunable = [
                e for e in epochs if e != self.best_epoch
            ][: max(0, len(epochs) - self.keep)]
            for e in prunable:
                shutil.rmtree(os.path.join(self.directory, str(e)),
                              ignore_errors=True)


def construct_orbax_callbacks(H, save_path, *, checkpoint_monitor="val_acc",
                              keep_epoch_ckpts=None, primary=True):
    """Default callback set with the orbax checkpoint backend. History
    callbacks only on the primary process (single writer); the orbax save
    itself must run on every process (collective)."""
    callbacks = []
    if primary:
        callbacks += [
            LambdaCallback(on_epoch_end=partial(_append_to_history_csv, H=H)),
            LambdaCallback(
                on_epoch_end=partial(_save_history_csv, save_path=save_path,
                                     H=H)
            ),
        ]
    callbacks.append(
        OrbaxEpochCheckpoint(
            os.path.join(save_path, "orbax"), monitor=checkpoint_monitor,
            keep=keep_epoch_ckpts, write_meta=primary,
        )
    )
    return callbacks


def load_history(save_path: str) -> dict:
    """Replay history.csv into the H dict for --resume
    (reference ``train.py:274-278``)."""
    df = pd.read_csv(os.path.join(save_path, "history.csv"))
    return {col: list(df[col].values) for col in df.columns if col != "Unnamed: 0"}


def load_pretrained_model(state_template_variables, checkpoint_path: str):
    """Strict restore of model variables from a checkpoint file
    (reference ``src/training_loop.py:72-77``). Returns restored variables."""
    model_sd, _ = load_weights(checkpoint_path)
    restored = restore_into(state_template_variables, model_sd)
    logger.info("Done reloading!")
    return restored


def resume_train_state(state, checkpoint_path: str, scheduler=None):
    """Full resume: restores params, batch_stats, optimizer state, the
    micro-step counter, any pending gradient-accumulation buffer (fixes
    the reference's optimizer-not-restored gap, ``train.py:269-278``) and —
    when a plateau ``scheduler`` is passed — its decision state
    (best/num_bad_epochs/cooldown), so a resumed run drops the LR at the
    same epoch the uninterrupted run would."""
    state, _ = _resume(state, checkpoint_path, scheduler)
    return state


def resume_midtrain_state(state, checkpoint_path: str, scheduler=None):
    """Resume from a mid-epoch checkpoint (``model_midtrain.pt``, written on
    preemption or by --checkpoint_every_steps; training/preemption.py).
    Returns ``(state, mid)`` where ``mid`` carries the interrupted epoch,
    the next batch index and the epoch's running sums — pass it to
    ``Trainer.train_loop(resume_mid=...)``."""
    _, opt_sd = load_weights(checkpoint_path)
    if not (isinstance(opt_sd, dict) and "mid" in opt_sd):
        # checked BEFORE restoring so the template state is untouched
        raise ValueError(
            f"{checkpoint_path} is not a mid-epoch checkpoint (no 'mid' blob)"
        )
    return _resume(state, checkpoint_path, scheduler)


def _resume(state, checkpoint_path: str, scheduler=None):
    import jax.numpy as jnp

    model_sd, opt_sd = load_weights(checkpoint_path)
    mid = opt_sd.pop("mid", None) if isinstance(opt_sd, dict) else None
    if scheduler is not None and isinstance(opt_sd, dict) and "scheduler" in opt_sd:
        scheduler.load_state_dict(
            {k: type(getattr(scheduler, k))(v)
             for k, v in opt_sd.pop("scheduler").items()}
        )
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    restored_vars = restore_into(variables, model_sd)
    new = state.replace(params=restored_vars["params"])
    if state.batch_stats is not None:
        new = new.replace(batch_stats=restored_vars["batch_stats"])
    if opt_sd:
        if "opt_state" in opt_sd:  # full layout (opt_state/step/accum_grads)
            new = new.replace(
                opt_state=restore_into(state.opt_state, opt_sd["opt_state"]),
                step=jnp.asarray(opt_sd["step"], jnp.int32),
            )
            if state.accum_grads is not None and "accum_grads" in opt_sd:
                new = new.replace(
                    accum_grads=restore_into(
                        state.accum_grads, opt_sd["accum_grads"]
                    )
                )
        else:  # legacy layout: bare optimizer pytree
            new = new.replace(opt_state=restore_into(state.opt_state, opt_sd))
    return new, mid
