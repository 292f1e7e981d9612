"""Guided vs random ensemble-diversity training signals.

The reference ships vestigial gin configs (``configs/training_guided.gin``,
``training_random.gin`` — ``Bias_Mitigation_Strong`` / ``_Random``) from a
sibling codebase; no diversity loss is implemented there (SURVEY.md §2.3/§2.7:
in the reference, diversity comes only from the MIMO shuffles). Per the build
plan, the rebuild honors the *intent* with a first-class knob:

* ``guided`` — an explicit diversity-encouraging regularizer: mean pairwise
  cosine similarity between the heads' softmax distributions with the true
  class muted (the same "muted top-k" view the analysis uses for its
  Kendall-tau diversity metric, ``notebooks/analysis_round_1.py:74-113``).
  Minimizing it pushes heads to disagree on their *error* distribution while
  the CE term keeps them accurate.
* ``random`` — the unguided baseline: independent per-head logit jitter of
  matched magnitude, providing the same optimization noise with no directed
  signal (so guided-vs-random isolates the value of the guidance).
* ``none`` — reference-parity default.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DIVERSITY_KINDS = ("none", "guided", "random")


def muted_probs(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Softmax over heads with the true-class probability zeroed.

    logits: (B, E, C); y: (B,) or (B, E) (uses column 0 if per-head labels).
    """
    if y.ndim == 2:
        y = y[:, 0]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    mask = jax.nn.one_hot(y, logits.shape[-1], dtype=p.dtype)  # (B, C)
    return p * (1.0 - mask[:, None, :])


def guided_diversity_penalty(logits: jax.Array, y: jax.Array) -> jax.Array:
    """Mean pairwise cosine similarity of muted head distributions. In [−1,1];
    lower = more diverse heads."""
    p = muted_probs(logits, y)  # (B, E, C)
    norm = jnp.linalg.norm(p, axis=-1, keepdims=True)
    pn = p / jnp.maximum(norm, 1e-12)
    sim = jnp.einsum("bec,bfc->bef", pn, pn)  # (B, E, E)
    e = logits.shape[1]
    if e < 2:
        return jnp.zeros((), jnp.float32)
    off_diag = sim * (1.0 - jnp.eye(e)[None])
    return off_diag.sum(axis=(1, 2)).mean() / (e * (e - 1))


def apply_diversity(
    loss: jax.Array,
    logits: jax.Array,
    y: jax.Array,
    key: jax.Array,
    *,
    kind: str = "none",
    coef: float = 0.0,
) -> jax.Array:
    """Augment a training loss with the chosen diversity signal."""
    if kind == "none" or coef == 0.0:
        return loss
    if kind == "guided":
        return loss + coef * guided_diversity_penalty(logits, y)
    if kind == "random":
        # matched-magnitude undirected signal: correlation against random
        # unit directions (expectation 0, same gradient scale as guided)
        p = muted_probs(logits, y)
        noise = jax.random.normal(key, p.shape, p.dtype)
        noise = noise / jnp.maximum(
            jnp.linalg.norm(noise, axis=-1, keepdims=True), 1e-12
        )
        pn = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), 1e-12)
        sim = (pn * noise).sum(-1).mean()
        return loss + coef * sim
    raise ValueError(f"unknown diversity kind {kind!r}")
