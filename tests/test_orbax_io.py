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
