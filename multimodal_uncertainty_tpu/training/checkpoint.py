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

import atexit
import logging
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

# Single background writer: device->host copy happens on the caller (cheap,
# consistent snapshot); msgpack serialization + disk I/O happen off the
# training thread so epoch boundaries don't stall on checkpoint size.
_writer = ThreadPoolExecutor(max_workers=1)
_pending_lock = threading.Lock()
_pending: dict = {}


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(jax.device_get(a)), tree)


def _write_blob(state: dict, filename: str) -> None:
    blob = serialization.msgpack_serialize(state)
    tmp = filename + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, filename)


def flush_pending_writes() -> None:
    """Block until all queued checkpoint writes are on disk (and any
    queued retention pruning has run — the writer is a FIFO barrier).
    Also finalizes any in-flight orbax saves when that backend is in use,
    so every flush point (train end, preemption stop, atexit) covers both
    backends."""
    with _pending_lock:
        futures = list(_pending.values())
    for f in futures:
        f.result()
    try:
        _writer.submit(lambda: None).result()  # drain non-write tasks too
    except RuntimeError:  # interpreter/executor shutdown (atexit path)
        pass
    import sys

    orbax_io = sys.modules.get(
        "multimodal_uncertainty_tpu.training.orbax_io"
    )
    if orbax_io is not None and orbax_io._CKPTR is not None:
        try:
            orbax_io._CKPTR.wait_until_finished()
        except Exception:  # pragma: no cover - shutdown races
            logging.getLogger(__name__).warning(
                "orbax flush failed", exc_info=True
            )


atexit.register(flush_pending_writes)


def save_weights(
    model_variables: Any,
    opt_state: Optional[Any],
    filename: str,
    *,
    async_write: bool = True,
) -> None:
    """Save all weights necessary to resume training.

    The device->host snapshot is taken synchronously; serialization and the
    atomic file write run on a background thread by default (pass
    ``async_write=False`` or call :func:`flush_pending_writes` to block).
    """
    state = {
        "model": _to_numpy(model_variables),
        "optimizer": _to_numpy(opt_state) if opt_state is not None else {},
    }
    if not async_write:
        _write_blob(state, filename)
        return
    with _pending_lock:
        prev = _pending.get(filename)
    if prev is not None:
        prev.result()  # keep per-file write order
    fut = _writer.submit(_write_blob, state, filename)
    with _pending_lock:
        _pending[filename] = fut


def enqueue_after_writes(fn) -> None:
    """Run ``fn()`` on the (single-worker, FIFO) checkpoint writer thread —
    i.e. after every write queued so far has hit disk. Used for retention
    pruning so it never races an in-flight async save. Exceptions are
    logged (nothing awaits the future, so they'd otherwise vanish)."""

    def guarded():
        try:
            fn()
        except Exception:
            logging.getLogger(__name__).warning(
                "checkpoint writer task %r failed", fn, exc_info=True
            )

    _writer.submit(guarded)


def load_weights(filename: str) -> Tuple[Any, Any]:
    """Returns (model_variables, opt_state) as numpy pytrees."""
    with _pending_lock:
        fut = _pending.get(filename)
    if fut is not None:
        fut.result()  # don't read a file whose write is still queued
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
