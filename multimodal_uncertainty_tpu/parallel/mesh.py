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
    sequence_parallel: int = 1,
    axis_names: Optional[Sequence[str]] = None,
) -> Mesh:
    """``sequence_parallel > 1`` adds a third 'seq' axis for ring attention
    (ops/ring.py): sequence shards rotate K/V around that axis's ICI ring.
    Keep it the mesh's MINOR (fastest-varying) axis so ring neighbors are
    ICI neighbors."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    assert n % (model_parallel * sequence_parallel) == 0, (
        n, model_parallel, sequence_parallel,
    )
    if sequence_parallel > 1:
        names = tuple(axis_names or ("data", "model", "seq"))
        grid = np.asarray(devices).reshape(
            n // (model_parallel * sequence_parallel),
            model_parallel,
            sequence_parallel,
        )
    else:
        names = tuple(axis_names or ("data", "model"))
        grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=names)
