from multimodal_uncertainty_tpu.utils.seeding import numpy_seed, set_seed  # noqa: F401
from multimodal_uncertainty_tpu.utils.trees import (  # noqa: F401
    tree_to_device,
    tree_to_numpy,
)
from multimodal_uncertainty_tpu.utils.logging_utils import TeeLog  # noqa: F401
