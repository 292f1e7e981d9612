"""Regression: MapLoader must propagate worker exceptions (found by the
flava smoke matrix — a missing data directory silently produced an empty
epoch before this fix)."""
import numpy as np
import pytest

from multimodal_uncertainty_tpu.data.loaders import MapLoader


class _BrokenDS:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i >= 4:
            raise FileNotFoundError(f"missing sample {i}")
        return i


def test_prefetch_loader_raises():
    loader = MapLoader(_BrokenDS(), 2, collate_fn=lambda x: np.asarray(x),
                       prefetch=2)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_no_prefetch_loader_raises():
    loader = MapLoader(_BrokenDS(), 2, collate_fn=lambda x: np.asarray(x),
                       prefetch=0)
    with pytest.raises(FileNotFoundError):
        list(loader)


def test_trainer_zero_batch_guard():
    import jax
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.training.optim import constant_schedule, sgd
    from multimodal_uncertainty_tpu.training.state import TrainState
    from multimodal_uncertainty_tpu.training.steps import ModelBundle
    from multimodal_uncertainty_tpu.training.trainer import Trainer

    bundle = ModelBundle(
        apply_fn=lambda v, x, *, train, rngs: (jnp.zeros((1, 1, 2)), {}),
        loss_fn=lambda l, y, *, eval=False: jnp.zeros(()),
        metric_fns=(),
    )
    opt = sgd(constant_schedule(0.0))
    params = {"w": jnp.zeros(())}
    state = TrainState(params=params, opt_state=opt.init(params),
                       step=jnp.zeros((), jnp.int32))
    trainer = Trainer(bundle, opt, state, rng=jax.random.key(0),
                      metrics_names=(), verbose=False)

    class Empty:
        def __len__(self):
            return 3

        def __iter__(self):
            return iter(())

    with pytest.raises(RuntimeError, match="no batches"):
        trainer.train_loop(Empty(), valid_generator=None, test_generator=None,
                           epochs=1, scheduler_step_on="none")


def test_map_loader_early_stop_reaps_producer():
    """Consumer abandoning the iterator (eval with steps < len) must not leak
    a blocked producer thread."""
    import threading
    import time

    class DS:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return i

    loader = MapLoader(DS(), 2, collate_fn=lambda x: np.asarray(x), prefetch=2)
    before = threading.active_count()
    for _ in range(3):
        it = iter(loader)
        next(it)
        it.close()  # abandon early
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


# ---------------------------------------------------------------------------
# DevicePrefetcher (background-thread host->device transfer)
# ---------------------------------------------------------------------------


def test_device_prefetcher_yields_identical_device_batches():
    import jax
    from multimodal_uncertainty_tpu.data.loaders import (
        ArrayLoader,
        DevicePrefetcher,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(20, 3)).astype(np.float32)
    y = rng.integers(0, 5, size=20)
    loader = ArrayLoader([x, y], batch_size=8)
    pre = DevicePrefetcher(loader)
    assert len(pre) == len(loader)
    got = list(pre)
    ref = list(loader)
    assert len(got) == len(ref)
    for (gx, gy), (rx, ry) in zip(got, ref):
        assert isinstance(gx, jax.Array) and isinstance(gy, jax.Array)
        np.testing.assert_array_equal(np.asarray(gx), rx)
        np.testing.assert_array_equal(np.asarray(gy), ry)
    # re-iterable (fresh producer per epoch)
    assert len(list(pre)) == len(ref)


def test_device_prefetcher_early_stop_reaps_producer():
    import threading

    from multimodal_uncertainty_tpu.data.loaders import (
        ArrayLoader,
        DevicePrefetcher,
    )

    n_before = threading.active_count()
    loader = ArrayLoader([np.zeros((64, 2), np.float32), np.zeros(64)], 4)
    it = iter(DevicePrefetcher(loader))
    next(it)
    it.close()
    # producer thread must exit promptly after close
    import time

    for _ in range(50):
        if threading.active_count() <= n_before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= n_before


def test_device_prefetcher_propagates_put_errors():
    from multimodal_uncertainty_tpu.data.loaders import (
        ArrayLoader,
        DevicePrefetcher,
    )

    loader = ArrayLoader([np.zeros((8, 2), np.float32), np.zeros(8)], 4)

    def bad_put(batch):
        raise ValueError("transfer failed")

    with pytest.raises(ValueError, match="transfer failed"):
        list(DevicePrefetcher(loader, put_fn=bad_put))


def test_trainer_device_prefetch_matches_plain():
    """device_prefetch=True must not change training numerics — only where
    the host->device copy happens."""
    import jax
    from multimodal_uncertainty_tpu.data.fmnist import get_fmnist
    from multimodal_uncertainty_tpu.training.trainer import Trainer
    from multimodal_uncertainty_tpu.zoo import setup_fashionmnist

    def run(prefetch):
        train, valid, _ = get_fmnist(
            batch_size=16, synthetic=True, synthetic_n=64, seed=3
        )
        setup = setup_fashionmnist(
            model_type="MultiHead", lr=0.05, seed_key=jax.random.key(1),
            attn_impl="xla",
        )
        tr = Trainer(
            setup.bundle, setup.optimizer, setup.state,
            rng=jax.random.key(2), plateau_scheduler=setup.plateau,
            size_fn=setup.size_fn, verbose=False, device_prefetch=prefetch,
        )
        tr.train_loop(
            train, valid_generator=valid, test_generator=valid,
            steps_per_epoch=len(train), epochs=2, callbacks=[],
            scheduler_step_on=setup.scheduler_step_on,
            scheduler_metric=setup.scheduler_metric,
        )
        return tr.eval_loop(valid, "val")

    a = run(False)
    b = run(True)
    assert float(a["val_loss"]) == float(b["val_loss"])
    assert float(a["val_acc"]) == float(b["val_acc"])
