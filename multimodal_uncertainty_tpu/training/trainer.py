"""Epoch driver: the TPU-native equivalent of the reference ``Model_``.

The reference trainer (``src/framework.py:98-355``) interleaves host-side
Python per batch (data forming, metric sync, callbacks). Here the per-batch
work is one jitted XLA program (see :mod:`training.steps`); the driver only
dispatches batches, keeps *device* scalars for the running sums, and syncs
once per epoch — callbacks, history and checkpoints stay on the host.

Behavioral parity preserved exactly:
 - size-weighted running means of loss/metrics (``src/framework.py:76-78``)
 - train metrics on the train head-layout, eval metrics on head-mean
 - early stopping counts epochs with train acc == 100, stopping after
   ``patience`` such epochs (``src/framework.py:344-349``)
 - NaN train loss aborts at epoch end (``:319`` + break at ``:349``)
 - ``eval_loop`` result dict keys ``{phase}_loss``/``{phase}_{metric}``/
   ``{phase}_auc``; AUROC computed host-side on gathered head-mean preds
 - scheduler stepping: 'batch' (schedule compiled into the optimizer) vs
   'epoch' (ReduceLROnPlateau on ``kwargs['scheduler_metric']``)
 - MMBT freeze_img/freeze_txt epochs (``src/framework.py:246-248,280-285``)
   via traced grad masks, and gradient accumulation (``:294-304``)
"""
from __future__ import annotations

import math
import os
import timeit
from typing import Any, Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.ops.metrics import binary_auroc
from multimodal_uncertainty_tpu.training.callbacks import (
    CallbackList,
    ProgressionCallback,
    ValidationProgressionCallback,
)
from multimodal_uncertainty_tpu.training.state import TrainState
from multimodal_uncertainty_tpu.training.steps import (
    ModelBundle,
    build_eval_step,
    build_train_step,
)


def _device_batch(batch):
    return jax.tree_util.tree_map(jnp.asarray, batch)


def _epoch_iterator(generator, epoch: int, start_batch: int):
    """Epoch-deterministic iteration when the generator supports it.

    Loaders expose ``iter_epoch(epoch, start_batch)`` (stateless shuffle —
    see data/loaders.py); a DevicePrefetcher is unwrapped so prefetch rides
    the explicit epoch iterator. Plain iterables fall back to ``iter`` (+
    islice when resuming mid-epoch)."""
    from multimodal_uncertainty_tpu.data.loaders import DevicePrefetcher

    if isinstance(generator, DevicePrefetcher):
        inner = _epoch_iterator(generator.loader, epoch, start_batch)
        return generator.iter_over(inner)
    if hasattr(generator, "iter_epoch"):
        return generator.iter_epoch(epoch, start_batch)
    if start_batch:
        import itertools

        return itertools.islice(iter(generator), start_batch, None)
    return iter(generator)


class Trainer:
    def __init__(
        self,
        bundle: ModelBundle,
        optimizer,
        state: TrainState,
        *,
        rng: jax.Array,
        metrics_names: Sequence[str] = ("acc",),
        plateau_scheduler=None,
        gradient_accumulation_steps: int = 1,
        size_fn: Optional[Callable] = None,
        verbose: bool = True,
        put_batch_fn: Optional[Callable] = None,
        device_prefetch: bool = False,
        state_shardings=None,
    ):
        self.bundle = bundle
        self.optimizer = optimizer
        self.state = state
        self.rng = rng
        self.metrics_names = list(metrics_names)
        self.plateau_scheduler = plateau_scheduler
        self.verbose = verbose
        self.size_fn = size_fn or (lambda x, y: len(y))
        self.put_batch = put_batch_fn or _device_batch
        self.device_prefetch = device_prefetch
        self._train_step = build_train_step(
            bundle, optimizer,
            gradient_accumulation_steps=gradient_accumulation_steps,
            state_shardings=state_shardings,
        )
        self._eval_step = build_eval_step(bundle)

    # -- checkpoint interface used by ModelCheckpoint ----------------------
    def checkpointable_state(self):
        variables = {"params": self.state.params}
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
        opt = {"opt_state": self.state.opt_state, "step": self.state.step}
        if self.state.accum_grads is not None:
            opt["accum_grads"] = self.state.accum_grads
        if self.plateau_scheduler is not None:
            # plateau decision state (best/num_bad_epochs/cooldown) must
            # survive --resume or a resumed run defers/doubles the LR drop
            opt["scheduler"] = dict(self.plateau_scheduler.state_dict())
        return variables, opt

    # ----------------------------------------------------------------------
    def eval_loop(
        self,
        generator: Iterable,
        phase: str,
        *,
        steps: Optional[int] = None,
        auc: bool = False,
        ece: bool = False,
    ) -> dict:
        if steps is None:
            steps = len(generator)
        if self.device_prefetch:
            from multimodal_uncertainty_tpu.data.loaders import DevicePrefetcher

            if not isinstance(generator, DevicePrefetcher):
                generator = DevicePrefetcher(generator, put_fn=self.put_batch)
        callback = ValidationProgressionCallback(
            phase=phase, steps=steps, metrics_names=["loss"] + self.metrics_names
        )

        losses, metric_vals, sizes = [], [], []
        # only hold per-batch preds across the epoch when something (AUROC /
        # ECE) will actually consume them — otherwise that's device memory
        # pinned for nothing on large eval sets
        keep_preds = auc or ece
        preds_all, labels_all = [], []
        for batch_ind, (x, y) in zip(range(1, steps + 1), generator):
            batch_begin_time = timeit.default_timer()
            if self.verbose:
                callback.on_batch_begin(batch_ind, {})
            size = self.size_fn(x, y)
            x, y = self.put_batch((x, y))
            logs, preds, labels = self._eval_step(self.state, x, y)
            losses.append(logs["loss"])
            metric_vals.append([logs[m] for m in self.metrics_names])
            sizes.append(size)
            if keep_preds:
                preds_all.append(preds)
                labels_all.append(labels)
            if self.verbose:
                callback.on_batch_end(
                    batch_ind,
                    {
                        "batch": batch_ind,
                        "size": size,
                        "batch_begin_time": batch_begin_time,
                        "loss": logs["loss"],
                        **{m: logs[m] for m in self.metrics_names},
                    },
                )

        if not losses:
            # reference StepIterator semantics: empty phase -> zeros
            info = {f"{phase}_loss": 0.0}
            info.update({f"{phase}_{m}": 0.0 for m in self.metrics_names})
            return info
        sizes_np = np.asarray(sizes, np.float64)
        losses_np = np.asarray(jax.device_get(jnp.stack(losses)), np.float64)
        loss = float((losses_np * sizes_np).sum() / sizes_np.sum()) if sizes_np.sum() else 0.0
        info = {f"{phase}_loss": loss}
        if metric_vals:
            mv = np.asarray(
                jax.device_get(jnp.asarray(metric_vals)), np.float64
            )  # (steps, n_metrics)
            weighted = (mv * sizes_np[:, None]).sum(0) / sizes_np.sum()
            info.update(
                {f"{phase}_{m}": float(v) for m, v in zip(self.metrics_names, weighted)}
            )
        if auc or ece:
            if jax.process_count() > 1:
                # data-sharded eval outputs are not host-readable on any
                # single process; allgather them (epoch-granular, off the
                # step path)
                from multimodal_uncertainty_tpu.parallel.multihost import (
                    gather_to_host,
                )

                preds_all = [gather_to_host(p) for p in preds_all]
                labels_all = [gather_to_host(l) for l in labels_all]
            preds = np.concatenate(jax.device_get(preds_all), axis=0)
            labels = np.concatenate(jax.device_get(labels_all), axis=0).reshape(-1)
            if auc:
                info[f"{phase}_auc"] = binary_auroc(labels, preds[:, 1])
            if ece:
                from multimodal_uncertainty_tpu.ops.metrics import (
                    expected_calibration_error,
                    softmax_np,
                )

                info[f"{phase}_ece"] = expected_calibration_error(
                    softmax_np(preds), labels
                )
        return info

    # ----------------------------------------------------------------------
    def train_loop(
        self,
        train_generator,
        test_generator=None,
        valid_generator=None,
        *,
        epochs: int = 1000,
        steps_per_epoch: Optional[int] = None,
        validation_steps: Optional[int] = None,
        test_steps: Optional[int] = None,
        patience: int = 10,
        callbacks: Sequence = (),
        epoch_start: int = 1,
        scheduler_step_on: str = "epoch",
        auc: bool = False,
        ece: bool = False,
        freeze_img: int = 0,
        freeze_txt: int = 0,
        scheduler_metric: Optional[str] = None,
        profile_dir: Optional[str] = None,
        profile_epoch: int = 2,
        preemption=None,
        midtrain_path: Optional[str] = None,
        checkpoint_every_steps: Optional[int] = None,
        resume_mid: Optional[dict] = None,
        **kwargs: Any,
    ):
        """(Preemption args — see training/preemption.py:) ``preemption`` is
        a PreemptionGuard polled at batch boundaries; when it triggers, the
        full mid-epoch state is saved to ``midtrain_path`` and the loop
        returns with ``self.preempted = True``. ``checkpoint_every_steps``
        additionally writes the same artifact every N batches (crash
        recovery without a signal). ``resume_mid`` is the ``mid`` blob from
        a previous mid-epoch checkpoint: the interrupted epoch continues
        from its recorded batch with its running sums, reproducing the
        uninterrupted run exactly."""
        callback_list = CallbackList(list(callbacks))
        if self.verbose:
            callback_list.append(ProgressionCallback())
        callback_list.set_params({"epochs": epochs, "steps": steps_per_epoch})
        callback_list.set_trainer(self)

        if self.device_prefetch:
            # Background-thread host->device transfer: upcoming batches are
            # already device-resident when the loop reaches them (put_batch
            # is then a no-op), overlapping transfer with the running step.
            from multimodal_uncertainty_tpu.data.loaders import DevicePrefetcher

            if not isinstance(train_generator, DevicePrefetcher):
                train_generator = DevicePrefetcher(
                    train_generator, put_fn=self.put_batch
                )

        stop_training = False
        stopped_epoch, counter = 0, 0
        self.preempted = False
        if resume_mid is not None:
            counter = int(resume_mid.get("acc100_counter", 0))

        callback_list.on_train_begin({})
        for epoch in range(epoch_start, epochs + 1):
            flags = None
            if self.bundle.grad_mask_fn is not None:
                flags = jnp.asarray(
                    [epoch < freeze_img, epoch < freeze_txt], jnp.bool_
                )

            callback_list.on_epoch_begin(epoch, {})
            epoch_begin_time = timeit.default_timer()

            # Optional XLA trace of one (post-compile) epoch.
            profiling = profile_dir is not None and epoch == profile_epoch
            if profiling:
                jax.profiler.start_trace(profile_dir)

            losses, metric_vals, sizes = [], [], []
            n_steps = steps_per_epoch if steps_per_epoch is not None else len(
                train_generator
            )
            # mid-epoch resume: re-enter the interrupted epoch at its
            # recorded batch, with its running weighted sums as the base
            start_batch = 0
            base_loss_sum = base_size_sum = 0.0
            base_metric_sums = np.zeros(len(self.metrics_names), np.float64)
            if resume_mid is not None and int(resume_mid["epoch"]) == epoch:
                start_batch = int(resume_mid["next_batch"])
                base_loss_sum = float(resume_mid["loss_sum"])
                base_size_sum = float(resume_mid["size_sum"])
                base_metric_sums = np.asarray(
                    resume_mid["metric_sums"], np.float64
                )
                resume_mid = None

            def _epoch_sums():
                if not losses:
                    return base_loss_sum, base_metric_sums, base_size_sum
                s = np.asarray(sizes, np.float64)
                ls = np.asarray(jax.device_get(jnp.stack(losses)), np.float64)
                m = np.asarray(
                    jax.device_get(jnp.asarray(metric_vals)), np.float64
                )
                return (
                    base_loss_sum + float((ls * s).sum()),
                    base_metric_sums + (m * s[:, None]).sum(0),
                    base_size_sum + float(s.sum()),
                )

            def _save_midtrain(completed):
                loss_sum, metric_sums, size_sum = _epoch_sums()
                variables, opt = self.checkpointable_state()
                opt["mid"] = {
                    "epoch": np.asarray(epoch, np.int64),
                    "next_batch": np.asarray(completed, np.int64),
                    "loss_sum": np.asarray(loss_sum, np.float64),
                    "metric_sums": np.asarray(metric_sums, np.float64),
                    "size_sum": np.asarray(size_sum, np.float64),
                    "acc100_counter": np.asarray(counter, np.int64),
                }
                from multimodal_uncertainty_tpu.training.checkpoint import (
                    save_weights,
                )

                save_weights(variables, opt, midtrain_path)

            epoch_iter = _epoch_iterator(train_generator, epoch, start_batch)
            for batch_ind, (x, y) in zip(
                range(start_batch + 1, n_steps + 1), epoch_iter
            ):
                batch_begin_time = timeit.default_timer()
                callback_list.on_batch_begin(batch_ind, {})
                callback_list.on_forward_begin(batch_ind, (x, y))
                size = self.size_fn(x, y)
                x, y = self.put_batch((x, y))
                key = jax.random.fold_in(
                    jax.random.fold_in(self.rng, epoch), batch_ind
                )
                self.state, logs = self._train_step(self.state, x, y, key, flags)
                losses.append(logs["loss"])
                metric_vals.append([logs[m] for m in self.metrics_names])
                sizes.append(size)
                callback_list.on_backward_end(batch_ind)
                callback_list.on_batch_end(
                    batch_ind,
                    {
                        "batch": batch_ind,
                        "size": size,
                        "time": timeit.default_timer() - batch_begin_time,
                        "batch_begin_time": batch_begin_time,
                        "loss": logs["loss"],
                        **{m: logs[m] for m in self.metrics_names},
                    },
                )
                if (
                    preemption is not None
                    and preemption.triggered
                    and batch_ind < n_steps
                ):
                    # midtrain_path is None on non-primary multihost
                    # processes: they stop at the same boundary (every
                    # process sees the signal) but only one host writes
                    if midtrain_path is not None:
                        _save_midtrain(batch_ind)
                    if profiling:
                        jax.profiler.stop_trace()
                    from multimodal_uncertainty_tpu.training.checkpoint import (
                        flush_pending_writes,
                    )

                    flush_pending_writes()
                    self.preempted = True
                    print(
                        f"Preempted at epoch {epoch} batch {batch_ind}: "
                        f"mid-epoch state saved to {midtrain_path}; "
                        f"resume to continue from the next batch"
                    )
                    return self.state
                if (
                    midtrain_path is not None
                    and checkpoint_every_steps
                    and batch_ind % checkpoint_every_steps == 0
                    and batch_ind < n_steps
                ):
                    _save_midtrain(batch_ind)

            if not losses and base_size_sum == 0.0:
                raise RuntimeError(
                    f"epoch {epoch}: train generator yielded no batches "
                    f"(expected {n_steps} steps) — check the data pipeline"
                )

            if profiling:
                # sync before stopping the trace so the epoch's compute is
                # in it; losses can be empty when a mid-epoch resume
                # re-enters the profiled epoch with no batches left
                if losses:
                    jax.device_get(losses[-1])
                jax.profiler.stop_trace()

            if preemption is not None and preemption.triggered:
                # signal landed on the epoch's LAST batch (the in-loop check
                # excludes it) or during eval would be next: save with the
                # train phase complete (next_batch == n_steps) — resume
                # re-enters this epoch with zero train batches left and
                # runs just the evals + epoch-end callbacks
                if midtrain_path is not None:
                    _save_midtrain(n_steps)
                from multimodal_uncertainty_tpu.training.checkpoint import (
                    flush_pending_writes,
                )

                flush_pending_writes()
                self.preempted = True
                print(
                    f"Preempted at epoch {epoch} end-of-train: state saved"
                    f"{f' to {midtrain_path}' if midtrain_path else ''}; "
                    f"resume to run the epoch's evals"
                )
                return self.state

            loss_sum, metric_sums, size_sum = _epoch_sums()
            denom = size_sum if size_sum else 1.0
            train_dict = {"loss": loss_sum / denom}
            train_dict.update(
                {
                    m: float(v)
                    for m, v in zip(self.metrics_names, metric_sums / denom)
                }
            )
            if math.isnan(train_dict["loss"]):
                stop_training = True

            if midtrain_path is not None and os.path.exists(midtrain_path):
                # the epoch completed: its mid-epoch recovery point is stale
                # (resume must go through model_last_epoch.pt). Removal rides
                # the writer queue so it lands after any queued write of the
                # same file.
                from multimodal_uncertainty_tpu.training.checkpoint import (
                    enqueue_after_writes,
                )

                enqueue_after_writes(
                    lambda p=midtrain_path: os.path.exists(p) and os.remove(p)
                )

            val_dict = (
                self.eval_loop(valid_generator, "val", steps=validation_steps,
                               auc=auc, ece=ece)
                if valid_generator is not None
                else {}
            )
            test_dict = (
                self.eval_loop(test_generator, "test", steps=test_steps,
                               auc=auc, ece=ece)
                if test_generator is not None
                else {}
            )

            epoch_log = {
                "epoch": epoch,
                "time": timeit.default_timer() - epoch_begin_time,
                "epoch_begin_time": epoch_begin_time,
                **train_dict,
                **val_dict,
                **test_dict,
            }

            if scheduler_step_on == "epoch" and self.plateau_scheduler is not None:
                scale = self.plateau_scheduler.step(epoch_log[scheduler_metric])
                self.state = self.state.replace(
                    opt_state={
                        **self.state.opt_state,
                        "lr_scale": jnp.asarray(scale, jnp.float32),
                    }
                )

            callback_list.on_epoch_end(epoch, epoch_log)

            if epoch_log.get("acc") == 100:
                counter += 1
            if counter >= patience:
                stopped_epoch, stop_training = epoch, True
            if stop_training:
                break

        callback_list.on_train_end({})
        # checkpoint writes are async (training/checkpoint.py); make them
        # durable before returning control to the caller
        from multimodal_uncertainty_tpu.training.checkpoint import (
            flush_pending_writes,
        )

        flush_pending_writes()
        if stopped_epoch > 0:
            print("Epoch %05d: completed stopping" % stopped_epoch)
        return self.state
