"""Checkpoint I/O.

Keeps the reference's artifact contract (``src/utils.py:98-106``,
``src/training_loop.py:40-45``): files named ``model_best_val.pt``,
``model_epoch_{e}.pt``, ``model_last_epoch.pt`` holding
``{'model': ..., 'optimizer': ...}`` — here serialized as msgpack pytrees of
numpy arrays instead of torch pickles. Unlike the reference (which only
restored model weights on --resume, ``train.py:269-278``), ``load_weights``
returns the optimizer state too so resume is exact.
"""
from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), tree)


def save_weights(model_variables: Any, opt_state: Optional[Any], filename: str) -> None:
    """Save all weights necessary to resume training."""
    state = {
        "model": _to_numpy(model_variables),
        "optimizer": _to_numpy(opt_state) if opt_state is not None else {},
    }
    blob = serialization.msgpack_serialize(state)
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, filename)


def load_weights(filename: str) -> Tuple[Any, Any]:
    """Returns (model_variables, opt_state) as numpy pytrees."""
    with open(filename, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    return state["model"], state.get("optimizer", {})


def restore_into(template: Any, loaded: Any) -> Any:
    """Restore `loaded` (dicts of numpy) into the dtypes/structure of
    `template` (strict merge, like the reference's
    ``_load_pretrained_model``, ``src/training_loop.py:72-77``)."""
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    treedef = jax.tree_util.tree_structure(template)

    def get_from(loaded, path):
        node = loaded
        for p in path:
            key = p.key if hasattr(p, "key") else (
                p.idx if hasattr(p, "idx") else str(p)
            )
            if isinstance(node, (list, tuple)):
                node = node[int(key)]
            else:
                if key not in node and str(key) in node:
                    key = str(key)
                node = node[key]
        return node

    leaves = []
    for path, t_leaf in flat_t:
        l_leaf = get_from(loaded, path)
        arr = np.asarray(l_leaf)
        if arr.shape != tuple(np.shape(t_leaf)):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(path)}: "
                f"checkpoint {arr.shape} vs model {np.shape(t_leaf)}"
            )
        leaves.append(arr.astype(np.asarray(t_leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
