from multimodal_uncertainty_tpu.training.state import TrainState  # noqa: F401
from multimodal_uncertainty_tpu.training.steps import (  # noqa: F401
    ModelBundle,
    build_eval_step,
    build_train_step,
)
from multimodal_uncertainty_tpu.training.trainer import Trainer  # noqa: F401
