"""Device-mesh construction.

The reference is single-GPU (``train.py:307-310``; no distributed layer —
SURVEY.md §2.8). Scaling here is TPU-idiomatic: a 2-D ('data', 'model') mesh
over ICI; the batch shards over 'data' (pure DP) and, optionally, transformer
weights shard over 'model' (TP). XLA/GSPMD inserts all collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    model_parallel: int = 1,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=tuple(axis_names))
