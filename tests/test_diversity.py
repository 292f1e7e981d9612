"""Diversity-signal tests (guided vs random, training effect on tau)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_uncertainty_tpu.ops.diversity import (
    apply_diversity,
    guided_diversity_penalty,
    muted_probs,
)

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


def test_muted_probs_zeroes_true_class():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3, 5)))
    y = jnp.asarray([0, 1, 2, 3])
    p = muted_probs(logits, y)
    for i in range(4):
        assert float(p[i, :, int(y[i])].max()) == 0.0


def test_guided_penalty_ordering():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.integers(0, 5, size=8))
    base = rng.normal(size=(8, 1, 5))
    identical = jnp.asarray(np.repeat(base, 3, axis=1))
    diverse = jnp.asarray(rng.normal(size=(8, 3, 5)) * 3)
    p_same = float(guided_diversity_penalty(identical, y))
    p_div = float(guided_diversity_penalty(diverse, y))
    assert p_same > p_div  # identical heads are maximally similar
    assert p_same > 0.99


def test_single_head_penalty_zero():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(4, 1, 5)))
    assert float(guided_diversity_penalty(logits, jnp.zeros(4, jnp.int32))) == 0.0


@pytest.mark.slow  # excluded from the quick tier
def test_apply_diversity_dispatch():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(4, 2, 5)))
    y = jnp.asarray([0, 1, 2, 3])
    loss = jnp.asarray(1.0)
    key = jax.random.key(0)
    assert float(apply_diversity(loss, logits, y, key, kind="none", coef=1.0)) == 1.0
    g = float(apply_diversity(loss, logits, y, key, kind="guided", coef=0.5))
    assert g != 1.0
    r = float(apply_diversity(loss, logits, y, key, kind="random", coef=0.5))
    assert np.isfinite(r)
    # gradients flow
    grad = jax.grad(
        lambda l: apply_diversity(jnp.sum(l * 0.0), l, y, key, kind="guided", coef=1.0)
    )(logits)
    assert float(jnp.abs(grad).max()) > 0


@pytest.mark.slow  # excluded from the quick tier
def test_guided_training_reduces_head_similarity():
    """Two linear heads on the same features: guided penalty drives their
    muted predictions apart vs the no-penalty baseline."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, size=64))
    w0 = jnp.asarray(rng.normal(size=(2, 16, 4)).astype(np.float32) * 0.1)

    def loss_fn(w, coef):
        logits = jnp.einsum("bd,edc->bec", x, w)
        ce = -jnp.mean(
            jnp.take_along_axis(
                jax.nn.log_softmax(logits, -1),
                jnp.broadcast_to(y[:, None, None], (64, 2, 1)),
                axis=-1,
            )
        )
        return apply_diversity(ce, logits, y, jax.random.key(0),
                               kind="guided", coef=coef)

    def train(coef):
        w = w0
        for _ in range(100):
            g = jax.grad(loss_fn)(w, coef)
            w = w - 0.5 * g
        logits = jnp.einsum("bd,edc->bec", x, w)
        return float(guided_diversity_penalty(logits, y))

    assert train(1.0) < train(0.0)
