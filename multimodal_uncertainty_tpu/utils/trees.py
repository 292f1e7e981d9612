"""Pytree transfer helpers (reference ``src/utils.py:76-119``)."""
from __future__ import annotations

import jax
import numpy as np


def tree_to_device(tree, sharding=None):
    """Host pytree -> device arrays (optionally with a Sharding)."""
    if sharding is None:
        return jax.tree_util.tree_map(jax.numpy.asarray, tree)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), sharding), tree
    )


def tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), tree)
