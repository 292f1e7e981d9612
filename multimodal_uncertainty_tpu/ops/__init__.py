"""Pure-function compute ops: data forming, losses, metrics, attention, norms.

Everything here is jit-compatible (static shapes, PRNG-key randomness) so the
trainer can compile the whole step — including the MIMO batch transforms that
the reference ran on CPU per batch — into one XLA program.
"""
from multimodal_uncertainty_tpu.ops.data_forming import (  # noqa: F401
    data_forming_func,
    data_forming_func_transformer,
)
from multimodal_uncertainty_tpu.ops.losses import mimo_cross_entropy  # noqa: F401
from multimodal_uncertainty_tpu.ops.metrics import (  # noqa: F401
    accuracy,
    binary_auroc,
    expected_calibration_error,
)
from multimodal_uncertainty_tpu.ops.ring import (  # noqa: F401
    ring_attention,
    ring_attention_sharded,
)
