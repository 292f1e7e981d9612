"""Seeding: explicit PRNG-key discipline replacing the reference's global
``set_seed`` (``src/utils.py:14-21``). numpy/python seeding is kept for the
host-side data pipeline; device randomness flows through jax.random keys."""
from __future__ import annotations

import random
from contextlib import contextmanager

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key for the run."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


@contextmanager
def numpy_seed(seed, *addl_seeds):
    """Context manager seeding the NumPy PRNG and restoring state after
    (reference ``src/utils.py:167-181``; used for reproducible data
    corruption such as drop_img)."""
    if seed is None:
        yield
        return
    if len(addl_seeds) > 0:
        seed = int(hash((seed, *addl_seeds)) % 1e6)
    state = np.random.get_state()
    np.random.seed(seed)
    try:
        yield
    finally:
        np.random.set_state(state)
