"""Loss functions for multi-head / MIMO ensembles.

Reference semantics (``src/model.py:102-112,161-171,293-304``): every model's
``compute_loss`` flattens the (B, E, C) head logits to (B*E, C) against
flattened labels during training (one CE term per ensemble member), and
averages the *logits* over heads before a single CE at eval.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross entropy, computed in fp32 for stability.

    Matches ``torch.nn.CrossEntropyLoss()`` (mean reduction) on integer labels.
    """
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def mimo_cross_entropy(
    y_hat: jax.Array, y: jax.Array, *, eval: bool = False
) -> jax.Array:
    """CE over head-flattened logits (train) or head-mean logits (eval).

    y_hat: (B, E, C); y: (B, E) at train (already formed), (B,) at eval.
    Reference: ``src/model.py:293-304``.
    """
    y = y.reshape(-1)
    if not eval:
        y_hat = y_hat.reshape(-1, y_hat.shape[-1])
    else:
        y_hat = y_hat.mean(axis=1)
    return softmax_cross_entropy(y_hat, y)


def plain_cross_entropy(y_hat: jax.Array, y: jax.Array, *, eval: bool = False) -> jax.Array:
    """Single-head CE used by MMBT (reference ``src/mmbt.py:261-262``)."""
    del eval
    return softmax_cross_entropy(y_hat, y.reshape(-1))
