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

``StepIterator`` replicates the reference's standalone aggregation helper
(``src/framework.py:35-95``): wraps a batch generator, keeps size-weighted
running means of loss/metrics, collects extra per-step fields, and fires
batch callbacks.
"""
from __future__ import annotations

import itertools
import timeit

import numpy as np

from multimodal_uncertainty_tpu.training.trainer import Trainer as Model_  # noqa: F401,N812


def cycle(iterable):
    while True:
        for x in iterable:
            yield x


def _get_step_iterator(steps, generator):
    count_iterator = range(1, steps + 1) if steps is not None else itertools.count(1)
    generator = cycle(generator) if steps is not None else generator
    return zip(count_iterator, generator)


class StepIterator:
    """Size-weighted running-mean aggregator over a batch generator."""

    def __init__(self, generator, steps_per_epoch, callback, metrics_names):
        self.generator = generator
        self.steps_per_epoch = steps_per_epoch
        self.callback = callback
        self.metrics_names = list(metrics_names)

        self.losses_sum = 0.0
        self.metrics_sum = np.zeros(len(self.metrics_names))
        self.sizes_sum = 0.0
        self.extra_lists: dict = {}
        self.defaultfields = ["loss", "metrics", "number", "size"]

    @property
    def loss(self):
        return self.losses_sum / self.sizes_sum if self.sizes_sum != 0 else 0

    @property
    def metrics(self):
        if self.sizes_sum == 0:
            return dict(zip(self.metrics_names, np.zeros(len(self.metrics_names))))
        return dict(zip(self.metrics_names, self.metrics_sum / self.sizes_sum))

    def __iter__(self):
        for batch_ind, data in _get_step_iterator(self.steps_per_epoch, self.generator):
            batch_begin_time = timeit.default_timer()
            self.callback.on_batch_begin(batch_ind, {})
            self.callback.on_forward_begin(batch_ind, data)

            step_data = {"number": batch_ind}
            yield step_data, data

            self.losses_sum += step_data["loss"] * step_data["size"]
            self.metrics_sum += np.asarray(step_data["metrics"]) * step_data["size"]
            self.sizes_sum += step_data["size"]

            metrics_dict = dict(zip(self.metrics_names, step_data["metrics"]))
            for key, value in step_data.items():
                if key not in self.defaultfields:
                    self.extra_lists.setdefault(key, []).append(value)

            batch_total_time = timeit.default_timer() - batch_begin_time
            self.callback.on_batch_end(
                batch_ind,
                {
                    "batch": batch_ind,
                    "size": step_data["size"],
                    "time": batch_total_time,
                    "batch_begin_time": batch_begin_time,
                    "loss": step_data["loss"],
                    **metrics_dict,
                },
            )
