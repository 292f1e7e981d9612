"""Reference-API compat shim tests (framework.Model_, StepIterator)."""
import pytest
import numpy as np

from multimodal_uncertainty_tpu.framework import Model_, StepIterator
from multimodal_uncertainty_tpu.training.callbacks import Callback
from multimodal_uncertainty_tpu.training.trainer import Trainer

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


def test_model_alias():
    assert Model_ is Trainer


class _Recorder(Callback):
    def __init__(self):
        self.begins, self.ends = [], []

    def on_batch_begin(self, batch, logs):
        self.begins.append(batch)

    def on_batch_end(self, batch, logs):
        self.ends.append((batch, logs["loss"], logs["size"]))


def test_step_iterator_weighted_means_and_extras():
    data = [("a", 8), ("b", 2)]
    cb = _Recorder()
    it = StepIterator(iter(data), steps_per_epoch=2, callback=cb,
                      metrics_names=["acc"])
    losses = {"a": 8.0, "b": 2.0}
    accs = {"a": 100.0, "b": 50.0}
    for step, (tag, size) in it:
        step["loss"] = losses[tag]
        step["size"] = size
        step["metrics"] = np.asarray([accs[tag]])
        step["extra_field"] = tag
    # size-weighted: (8*8 + 2*2)/10 = 6.8 ; acc (100*8+50*2)/10 = 90
    assert abs(it.loss - 6.8) < 1e-12
    assert abs(it.metrics["acc"] - 90.0) < 1e-12
    assert it.extra_lists["extra_field"] == ["a", "b"]
    assert cb.begins == [1, 2]
    assert [b for b, *_ in cb.ends] == [1, 2]


def test_step_iterator_empty():
    it = StepIterator(iter(()), steps_per_epoch=None, callback=_Recorder(),
                      metrics_names=["acc"])
    for step, data in it:
        raise AssertionError("should not yield")
    assert it.loss == 0
    assert it.metrics["acc"] == 0.0
