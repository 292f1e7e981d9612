"""Trainer behavioral semantics: early stop, NaN abort, plateau LR, weighting."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.training.optim import ReduceLROnPlateau, constant_schedule, sgd
from multimodal_uncertainty_tpu.training.state import TrainState
from multimodal_uncertainty_tpu.training.steps import ModelBundle
from multimodal_uncertainty_tpu.training.trainer import Trainer
from multimodal_uncertainty_tpu.training.callbacks import Callback

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


class _EpochCounter(Callback):
    def __init__(self):
        self.epochs = []

    def on_epoch_end(self, epoch, logs):
        self.epochs.append((epoch, dict(logs)))


def _toy_trainer(loss_value=0.1, acc_value=100.0, lr=0.0):
    """A fake 'model': a single scalar param, constant metrics."""

    def apply_fn(variables, x, *, train, rngs):
        w = variables["params"]["w"]
        logits = jnp.stack([x.sum(-1) * 0 + w, x.sum(-1) * 0 - w], -1)
        return logits[:, None, :], {}

    def loss_fn(logits, y, *, eval=False):
        return jnp.asarray(loss_value, jnp.float32) + 0.0 * logits.sum()

    def acc_fn(logits, y, *, eval):
        return jnp.asarray(acc_value, jnp.float32)

    bundle = ModelBundle(apply_fn=apply_fn, loss_fn=loss_fn,
                         metric_fns=(("acc", acc_fn),))
    opt = sgd(constant_schedule(lr))
    params = {"w": jnp.zeros(())}
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    plateau = ReduceLROnPlateau(mode="min", factor=0.5, patience=0)
    trainer = Trainer(bundle, opt, state, rng=jax.random.key(0),
                      plateau_scheduler=plateau, verbose=False)
    return trainer


def _loader(n_batches=2, b=4):
    rng = np.random.default_rng(0)
    batches = [(rng.normal(size=(b, 3)).astype(np.float32),
                rng.integers(0, 2, size=b)) for _ in range(n_batches)]

    class L:
        def __len__(self):
            return n_batches

        def __iter__(self):
            return iter(batches)

    return L()


def test_early_stop_on_train_acc_saturation():
    trainer = _toy_trainer(acc_value=100.0)
    counter = _EpochCounter()
    trainer.train_loop(
        _loader(), valid_generator=_loader(), test_generator=_loader(),
        epochs=50, patience=3, callbacks=[counter],
        scheduler_step_on="none",
    )
    # counts epochs with acc == 100, stops after `patience` such epochs
    assert len(counter.epochs) == 3


def test_no_early_stop_below_100():
    trainer = _toy_trainer(acc_value=99.0)
    counter = _EpochCounter()
    trainer.train_loop(
        _loader(), valid_generator=_loader(), test_generator=_loader(),
        epochs=5, patience=3, callbacks=[counter], scheduler_step_on="none",
    )
    assert len(counter.epochs) == 5


def test_nan_loss_aborts_at_epoch_end():
    trainer = _toy_trainer(loss_value=float("nan"), acc_value=0.0)
    counter = _EpochCounter()
    trainer.train_loop(
        _loader(), valid_generator=_loader(), test_generator=_loader(),
        epochs=10, patience=3, callbacks=[counter], scheduler_step_on="none",
    )
    # reference semantics: NaN detected in-batch but break happens after the
    # epoch's eval (src/framework.py:319,349) -> exactly one epoch logged
    assert len(counter.epochs) == 1


def test_plateau_updates_lr_scale_in_opt_state():
    trainer = _toy_trainer(acc_value=0.0, loss_value=0.5)
    trainer.train_loop(
        _loader(), valid_generator=_loader(), test_generator=_loader(),
        epochs=4, patience=10, callbacks=[],
        scheduler_step_on="epoch", scheduler_metric="val_loss",
    )
    # constant val_loss + patience 0 -> halved every epoch after the first
    assert float(trainer.state.opt_state["lr_scale"]) < 0.3


def test_size_weighted_epoch_means():
    """Uneven batch sizes must weight the epoch mean by batch size."""
    sizes_seen = []

    def apply_fn(variables, x, *, train, rngs):
        return jnp.zeros((x.shape[0], 1, 2)), {}

    def loss_fn(logits, y, *, eval=False):
        # loss equals the batch size so the weighted mean is checkable
        return jnp.asarray(float(logits.shape[0]), jnp.float32)

    bundle = ModelBundle(apply_fn=apply_fn, loss_fn=loss_fn, metric_fns=())
    opt = sgd(constant_schedule(0.0))
    params = {"w": jnp.zeros(())}
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(bundle, opt, state, rng=jax.random.key(0),
                      metrics_names=(), verbose=False)

    batches = [
        (np.zeros((8, 3), np.float32), np.zeros(8, np.int64)),
        (np.zeros((2, 3), np.float32), np.zeros(2, np.int64)),
    ]

    class L:
        def __len__(self):
            return 2

        def __iter__(self):
            return iter(batches)

    info = trainer.eval_loop(L(), "val")
    # size-weighted: (8*8 + 2*2) / 10 = 6.8 (simple mean would be 5.0)
    assert abs(info["val_loss"] - 6.8) < 1e-6
