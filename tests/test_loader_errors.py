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
