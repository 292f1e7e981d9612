"""TrainState: the single pytree carrying everything the jitted step needs."""
from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    batch_stats: Optional[Any] = None  # BatchNorm running statistics
    step: jax.Array = struct.field(default=None)  # global micro-step counter
    accum_grads: Optional[Any] = None  # gradient-accumulation buffer

    @property
    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v
