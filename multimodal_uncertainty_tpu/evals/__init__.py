"""Evaluation / robustness sweeps producing the reference's .npy artifacts."""
from multimodal_uncertainty_tpu.evals.prediction_saving import (  # noqa: F401
    save_predictions,
)
from multimodal_uncertainty_tpu.evals.robustness_fmnist import (  # noqa: F401
    missing_view_sweep,
)
from multimodal_uncertainty_tpu.evals.robustness_transformer import (  # noqa: F401
    input_sampling_masks,
    transformer_robustness_sweep,
)
