"""multimodal_uncertainty_tpu — TPU-native multimodal-uncertainty framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of the
reference research stack (wooginawunan/multi-modal-uncertainty): multi-head /
MIMO implicit-ensemble training of multimodal fusion classifiers, with
modality-ablation robustness sweeps and calibration/diversity analysis.

Environment configuration mirrors the reference (`src/__init__.py:12-13`):
``DATA_DIR`` and ``RESULTS_DIR`` environment variables with local defaults.
"""
from __future__ import annotations

import logging
import os

__version__ = "0.1.0"

DATA_DIR = os.environ.setdefault(
    "DATA_DIR", os.path.join(os.path.dirname(os.path.dirname(__file__)), "data_dir")
)
RESULTS_DIR = os.environ.setdefault(
    "RESULTS_DIR", os.path.join(os.path.dirname(os.path.dirname(__file__)), "results")
)

logging.getLogger(__name__).addHandler(logging.NullHandler())

# Optional platform override (e.g. MMU_PLATFORM=cpu for hermetic CI runs).
# Needed because this environment pins jax_platforms via sitecustomize,
# which ignores the plain JAX_PLATFORMS env var.
_platform = os.environ.get("MMU_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
