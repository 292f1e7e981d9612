"""Golden tests for the MIMO data-forming strategies against reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_uncertainty_tpu.ops.data_forming import (
    data_forming_func,
    data_forming_func_transformer,
)

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)

B, M, C, H, W = 8, 4, 1, 14, 14


def _batch():
    x = jnp.arange(B * M * C * H * W, dtype=jnp.float32).reshape(B, M, C, H, W)
    y = jnp.arange(B, dtype=jnp.int32)
    return x, y


def test_vanilla_train():
    x, y = _batch()
    x2, y2 = data_forming_func(jax.random.key(0), x, y, phase="train", model_type="Vanilla")
    assert x2.shape == x.shape and (x2 == x).all()
    assert y2.shape == (B, 1)
    np.testing.assert_array_equal(np.asarray(y2[:, 0]), np.asarray(y))


def test_multihead_train():
    x, y = _batch()
    _, y2 = data_forming_func(jax.random.key(0), x, y, phase="train", model_type="MultiHead")
    assert y2.shape == (B, M)
    for i in range(M):
        np.testing.assert_array_equal(np.asarray(y2[:, i]), np.asarray(y))


def test_weight_sharing_applied_every_phase():
    x, y = _batch()
    for phase in ("train", "eval"):
        x2, y2 = data_forming_func(
            jax.random.key(0), x, y, phase=phase, model_type="single-model-weight-sharing"
        )
        assert x2.shape == (B * M, C, H, W)
        assert y2.shape == (B * M,)
        # label i repeated M times contiguous (torch repeat(1, m).view(-1))
        np.testing.assert_array_equal(
            np.asarray(y2), np.repeat(np.arange(B), M)
        )
        # x rows preserve (sample, view) order
        np.testing.assert_array_equal(
            np.asarray(x2[3]), np.asarray(x[0, 3])
        )


def test_shuffle_instance_labels_follow_views():
    x, y = _batch()
    x2, y2 = data_forming_func(
        jax.random.key(42), x, y, phase="train", model_type="MIMO-shuffle-instance"
    )
    assert x2.shape == x.shape and y2.shape == (B, M)
    x_np, y_np = np.asarray(x2), np.asarray(y2)
    orig = np.asarray(x)
    # For every view, each (sample,view) slice must be an original slice of the
    # same view, and its label must match the original sample index.
    for v in range(M):
        seen = set()
        for b in range(B):
            src = int(y_np[b, v])  # label == original sample index
            np.testing.assert_array_equal(x_np[b, v], orig[src, v])
            seen.add(src)
        assert seen == set(range(B))  # permutation, not sampling w/ replacement


def test_shuffle_view_permutes_views_consistently():
    x, y = _batch()
    x2, y2 = data_forming_func(
        jax.random.key(7), x, y, phase="train", model_type="MIMO-shuffle-view"
    )
    assert y2.shape == (B, M)
    x_np, orig = np.asarray(x2), np.asarray(x)
    # recover the view permutation from sample 0 and check it's global
    perm = []
    for v in range(M):
        for src_v in range(M):
            if (x_np[0, v] == orig[0, src_v]).all():
                perm.append(src_v)
                break
    assert sorted(perm) == list(range(M))
    for b in range(B):
        for v in range(M):
            np.testing.assert_array_equal(x_np[b, v], orig[b, perm[v]])


def test_shuffle_all_is_instance_then_view():
    x, y = _batch()
    x2, y2 = data_forming_func(
        jax.random.key(3), x, y, phase="train", model_type="MIMO-shuffle-all"
    )
    x_np, y_np, orig = np.asarray(x2), np.asarray(y2), np.asarray(x)
    # Each slice must be some original (sample, view) pair whose label matches,
    # and each view column must hold slices from exactly one original view.
    for v in range(M):
        src_views = set()
        for b in range(B):
            found = False
            for sv in range(M):
                if (x_np[b, v] == orig[int(y_np[b, v]), sv]).all():
                    src_views.add(sv)
                    found = True
                    break
            assert found
        assert len(src_views) == 1


def test_eval_identity():
    x, y = _batch()
    for mt in ("Vanilla", "MultiHead", "MIMO-shuffle-instance", "MIMO-shuffle-view", "MIMO-shuffle-all"):
        x2, y2 = data_forming_func(jax.random.key(0), x, y, phase="eval", model_type=mt)
        assert (x2 == x).all() and (y2 == y).all() and y2.shape == (B,)


def test_transformer_path():
    img = jnp.arange(B * 5 * 3, dtype=jnp.float32).reshape(B, 5, 3)
    txt = jnp.arange(B * 7 * 3, dtype=jnp.float32).reshape(B, 7, 3) + 1000
    y = jnp.arange(B, dtype=jnp.int32)

    (i2, t2), y2 = data_forming_func_transformer(
        jax.random.key(0), (img, txt), y, phase="train", model_type="Vanilla"
    )
    assert y2.shape == (B, 1) and (i2 == img).all() and (t2 == txt).all()

    (_, _), y2 = data_forming_func_transformer(
        jax.random.key(0), (img, txt), y, phase="train", model_type="MultiHead"
    )
    assert y2.shape == (B, 2)

    (i2, t2), y2 = data_forming_func_transformer(
        jax.random.key(5), (img, txt), y, phase="train", model_type="MIMO-shuffle-instance"
    )
    assert y2.shape == (B, 2)
    i_np, t_np = np.asarray(i2), np.asarray(t2)
    for b in range(B):
        np.testing.assert_array_equal(i_np[b], np.asarray(img)[int(y2[b, 0])])
        np.testing.assert_array_equal(t_np[b], np.asarray(txt)[int(y2[b, 1])])
    # independent permutations (overwhelmingly likely to differ)
    assert not (np.asarray(y2[:, 0]) == np.asarray(y2[:, 1])).all()


def test_jit_compatible():
    x, y = _batch()
    f = jax.jit(
        lambda k, x, y: data_forming_func(
            k, x, y, phase="train", model_type="MIMO-shuffle-all"
        )
    )
    x2, y2 = f(jax.random.key(0), x, y)
    assert x2.shape == x.shape and y2.shape == (B, M)


def test_unknown_model_type_raises():
    x, y = _batch()
    with pytest.raises(ValueError):
        data_forming_func(jax.random.key(0), x, y, phase="train", model_type="nope")
