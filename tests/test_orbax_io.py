"""Orbax TrainState checkpoint backend: save/restore round-trip, latest-step
selection, and restore onto a sharded template (multi-chip resume path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_uncertainty_tpu.parallel.mesh import make_mesh
from multimodal_uncertainty_tpu.parallel.sharding import shard_state
from multimodal_uncertainty_tpu.training import orbax_io
from multimodal_uncertainty_tpu.training.steps import build_train_step
from multimodal_uncertainty_tpu.zoo import setup_fashionmnist


@pytest.fixture(scope="module")
def trained():
    setup = setup_fashionmnist(
        model_type="MIMO-shuffle-instance", lr=0.05,
        seed_key=jax.random.key(0), attn_impl="xla",
    )
    step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 4, 1, 14, 14)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=8).astype(np.int64))
    state, _ = step(setup.state, x, y, jax.random.key(1), None)
    state, _ = step(state, x, y, jax.random.key(2), None)
    return setup, state, (x, y)


def _tree_equal(a, b):
    return all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_roundtrip_and_latest(tmp_path, trained):
    setup, state, _ = trained
    orbax_io.save_train_state(state, str(tmp_path / "ckpt"), step=1)
    orbax_io.save_train_state(state, str(tmp_path / "ckpt"), step=7)
    assert orbax_io.latest_step(str(tmp_path / "ckpt")) == 7

    fresh = setup_fashionmnist(
        model_type="MIMO-shuffle-instance", lr=0.05,
        seed_key=jax.random.key(99), attn_impl="xla",
    )
    restored = orbax_io.restore_train_state(fresh.state, str(tmp_path / "ckpt"))
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.opt_state, state.opt_state)
    assert int(restored.step) == int(state.step)
    # restored state continues training identically to the original
    step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    _, (x, y) = trained[1], trained[2]
    s1, l1 = step(state, x, y, jax.random.key(3), None)
    s2, l2 = step(restored, x, y, jax.random.key(3), None)
    assert abs(float(l1["loss"]) - float(l2["loss"])) < 1e-6


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_restore_onto_sharded_template(tmp_path, trained):
    setup, state, _ = trained
    orbax_io.save_train_state(state, str(tmp_path / "ckpt"), step=3)
    mesh = make_mesh(8, model_parallel=1)
    sharded_template = shard_state(setup.state, mesh)
    restored = orbax_io.restore_train_state(
        sharded_template, str(tmp_path / "ckpt"), step=3
    )
    assert _tree_equal(restored.params, state.params)
    leaf = jax.tree_util.tree_leaves(restored.params)[0]
    assert leaf.sharding.mesh.shape == mesh.shape


def test_trainer_with_orbax_backend_and_resume(tmp_path):
    """The orbax backend as the trainer's checkpoint path
    (loop.construct_orbax_callbacks): per-epoch directory saves carrying
    the plateau scheduler's state in the extra blob, best.json tracking,
    retention pruning that never drops the best epoch, and a resumed run
    matching the uninterrupted one bit-for-bit."""
    import json
    import os

    import numpy as np

    from multimodal_uncertainty_tpu.data.fmnist import get_fmnist
    from multimodal_uncertainty_tpu.training.loop import (
        construct_orbax_callbacks,
        load_history,
    )
    from multimodal_uncertainty_tpu.training.trainer import Trainer
    from multimodal_uncertainty_tpu.zoo import setup_fashionmnist

    def build(tdir, H):
        os.makedirs(tdir, exist_ok=True)
        train, valid, _ = get_fmnist(
            batch_size=32, synthetic=True, synthetic_n=128, seed=7
        )
        setup = setup_fashionmnist(
            model_type="MultiHead", lr=0.05, seed_key=jax.random.key(1),
            attn_impl="xla",
        )
        cbs = construct_orbax_callbacks(
            H, str(tdir), keep_epoch_ckpts=2
        )
        tr = Trainer(setup.bundle, setup.optimizer, setup.state,
                     rng=jax.random.key(2), plateau_scheduler=setup.plateau,
                     size_fn=setup.size_fn, verbose=False)
        return tr, setup, train, valid, cbs

    def loop(tr, train, valid, cbs, setup, *, epochs, epoch_start=1):
        tr.train_loop(
            train, valid_generator=valid, test_generator=valid,
            steps_per_epoch=len(train), epochs=epochs, callbacks=cbs,
            patience=10, epoch_start=epoch_start,
            scheduler_step_on=setup.scheduler_step_on,
            scheduler_metric=setup.scheduler_metric,
        )

    # run A: 4 epochs straight through
    dir_a = tmp_path / "a"
    HA = {}
    tr_a, setup_a, train, valid, cbs_a = build(dir_a, HA)
    loop(tr_a, train, valid, cbs_a, setup_a, epochs=4)

    # run B: 2 epochs, then a fresh-process resume for epochs 3-4
    dir_b = tmp_path / "b"
    HB = {}
    tr_b, setup_b, train_b, valid_b, cbs_b = build(dir_b, HB)
    loop(tr_b, train_b, valid_b, cbs_b, setup_b, epochs=2)

    orbax_dir = str(dir_b / "orbax")
    assert orbax_io.latest_step(orbax_dir) == 2
    tr_b2, setup_b2, train_b2, valid_b2, cbs_b2 = build(dir_b, load_history(str(dir_b)))
    state, extra = orbax_io.restore_train_state(
        setup_b2.state, orbax_dir,
        extra_template=setup_b2.plateau.state_dict(),
    )
    setup_b2.plateau.load_state_dict(
        {k: type(getattr(setup_b2.plateau, k))(v) for k, v in extra.items()}
    )
    tr_b2.state = state
    loop(tr_b2, train_b2, valid_b2, cbs_b2, setup_b2, epochs=4, epoch_start=3)

    for pa, pb in zip(
        jax.tree_util.tree_leaves(
            (tr_a.state.params, tr_a.state.opt_state)
        ),
        jax.tree_util.tree_leaves(
            (tr_b2.state.params, tr_b2.state.opt_state)
        ),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    # best.json tracks the monitored metric; retention kept best + newest 2
    meta = json.load(open(os.path.join(orbax_dir, "best.json")))
    assert meta["best_epoch"] in (1, 2, 3, 4) and "val_acc" in meta
    kept = sorted(int(d) for d in os.listdir(orbax_dir) if d.isdigit())
    assert len(kept) <= 3 and meta["best_epoch"] in kept
    assert kept[-1] == 4  # newest always kept
