"""Reference-API compatibility surface.

Users of the reference import ``Model_`` / ``StepIterator`` from
``src.framework`` and ``_construct_default_callbacks`` from
``src.training_loop``. This module exposes those names on top of the
TPU-native internals so migration is a changed import path:

    from multimodal_uncertainty_tpu.framework import Model_, StepIterator
    from multimodal_uncertainty_tpu.training.loop import (
        _construct_default_callbacks,
    )

``Model_`` is the :class:`~multimodal_uncertainty_tpu.training.trainer.Trainer`
(same ``train_loop``/``eval_loop`` methods and epoch/callback semantics; the
constructor takes a ModelBundle + Optimizer + TrainState instead of torch
objects — use the :mod:`multimodal_uncertainty_tpu.zoo` factories).

``StepIterator`` covers the contract of the reference's standalone
aggregation helper (``src/framework.py:35-95``): wrap a batch generator,
expose size-weighted means of loss/metrics, collect extra per-step fields,
and fire batch callbacks. The implementation here is this repo's own —
per-step records aggregated lazily with ``np.average`` instead of the
reference's mutable running sums.
"""
from __future__ import annotations

import itertools
import timeit

import numpy as np

from multimodal_uncertainty_tpu.training.trainer import Trainer as Model_  # noqa: F401,N812

_CORE_FIELDS = frozenset({"loss", "metrics", "number", "size"})


def cycle(iterable):
    """Endlessly re-iterate `iterable` (must be re-iterable, e.g. a loader)."""
    while True:
        yield from iterable


def _get_step_iterator(steps, generator):
    """(1-based step index, batch) pairs; bounded + cycling when `steps` is
    given, unbounded passthrough otherwise."""
    if steps is None:
        return enumerate(generator, start=1)
    return zip(range(1, steps + 1), cycle(generator))


class StepIterator:
    """Per-epoch batch driver + size-weighted aggregator (compat shim).

    Usage contract (same as the reference helper): iterate ``(step, batch)``
    pairs, fill ``step["loss"] / step["size"] / step["metrics"]`` (plus any
    extra fields) inside the loop body; afterwards read ``.loss``,
    ``.metrics`` and ``.extra_lists``. Batch callbacks fire around each step
    with the reference's log keys (batch/size/time/batch_begin_time/loss +
    per-metric entries).
    """

    def __init__(self, generator, steps_per_epoch, callback, metrics_names):
        self.generator = generator
        self.steps_per_epoch = steps_per_epoch
        self.callback = callback
        self.metrics_names = list(metrics_names)
        # one (size, loss, metric-vector) record per completed step;
        # aggregates are computed lazily from these
        self._records: list = []
        self.extra_lists: dict = {}

    @property
    def loss(self):
        if not self._records:
            return 0
        sizes, losses, _ = zip(*self._records)
        return float(np.average(losses, weights=sizes))

    @property
    def metrics(self):
        if not self._records:
            values = np.zeros(len(self.metrics_names))
        else:
            sizes, _, mats = zip(*self._records)
            values = np.average(np.stack(mats), axis=0, weights=sizes)
        return dict(zip(self.metrics_names, values))

    def _record(self, step):
        self._records.append(
            (step["size"], step["loss"], np.asarray(step["metrics"], float))
        )
        for key, value in step.items():
            if key not in _CORE_FIELDS:
                self.extra_lists.setdefault(key, []).append(value)

    def __iter__(self):
        for number, batch in _get_step_iterator(self.steps_per_epoch,
                                                self.generator):
            t0 = timeit.default_timer()
            self.callback.on_batch_begin(number, {})
            self.callback.on_forward_begin(number, batch)

            step = {"number": number}
            yield step, batch

            self._record(step)
            logs = {
                "batch": number,
                "size": step["size"],
                "time": timeit.default_timer() - t0,
                "batch_begin_time": t0,
                "loss": step["loss"],
            }
            logs.update(zip(self.metrics_names, step["metrics"]))
            self.callback.on_batch_end(number, logs)
