"""Orbax-backed TrainState checkpointing (optional backend).

The default checkpoint path (:mod:`training.checkpoint`) keeps the
reference's single-file ``model_*.pt`` artifact contract. This module is
the TPU-idiomatic alternative (SURVEY.md §7): orbax writes sharding-aware,
multi-host-safe checkpoint directories and restores arrays directly onto
their target shardings — the right backend once training runs on a real
multi-chip mesh. Both backends serialize the FULL TrainState (params,
optimizer moments, step, batch_stats), so resume is exact either way.

Layout: ``{directory}/{step}/`` per save, orbax-managed; ``latest_step``
finds the newest.
"""
from __future__ import annotations

import os
from typing import Optional


_CKPTR = None


def _checkpointer():
    """Singleton StandardCheckpointer (it is an AsyncCheckpointer under the
    hood — saves finalize in the background; see save_train_state)."""
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def _state_dict(state, extra=None) -> dict:
    out = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if state.batch_stats is not None:
        out["batch_stats"] = state.batch_stats
    if state.accum_grads is not None:
        out["accum_grads"] = state.accum_grads
    if extra is not None:
        # host-side scalars riding along (e.g. the plateau scheduler's
        # decision state) — numpy-ify so orbax treats them as arrays
        import numpy as np

        out["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    return out


def save_train_state(state, directory: str, step: int, *,
                     wait: bool = True, extra: Optional[dict] = None) -> str:
    """Write a full TrainState under ``{directory}/{step}``; returns the
    path. The write is async (orbax finalizes a tmp dir rename in the
    background); ``wait=True`` blocks until it is durable on disk.
    ``extra``: a flat dict of host scalars saved alongside (restored when
    a matching ``extra_template`` is passed)."""
    path = os.path.join(os.path.abspath(directory), str(step))
    c = _checkpointer()
    c.save(path, _state_dict(state, extra))
    if wait:
        c.wait_until_finished()
    return path


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [int(d) for d in os.listdir(directory) if d.isdigit()]
    return max(steps) if steps else None


def restore_train_state(template_state, directory: str,
                        step: Optional[int] = None,
                        extra_template: Optional[dict] = None):
    """Restore into the structure/dtypes/shardings of ``template_state``.

    ``step=None`` restores the latest. Arrays land on the devices/shardings
    of the template's leaves (pass a mesh-sharded template to restore a
    distributed state directly — no host round-trip through a single
    process). With ``extra_template`` (matching the ``extra`` saved),
    returns ``(state, extra)`` instead of just the state.
    """
    _checkpointer().wait_until_finished()  # never read an in-flight save
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no orbax checkpoints under {directory}")
    path = os.path.join(os.path.abspath(directory), str(step))
    target = _state_dict(template_state, extra_template)
    restored = _checkpointer().restore(path, target=target)
    new = template_state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    if template_state.batch_stats is not None:
        new = new.replace(batch_stats=restored["batch_stats"])
    if template_state.accum_grads is not None:
        new = new.replace(accum_grads=restored["accum_grads"])
    if extra_template is not None:
        return new, restored["extra"]
    return new

