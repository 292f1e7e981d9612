"""Offline analysis: the reference's notebooks as an importable package.

Computational pieces (Δp correlations, ACC/AUC variant tables, Kendall-tau
diversity, learning-curve aggregation, checkpoint ensembling, + ECE) are pure
numpy/pandas functions with tests; plotting helpers are gated on matplotlib.
"""
from multimodal_uncertainty_tpu.analysis.utils import (  # noqa: F401
    get_correlation,
    load_robustness_experiment_results,
    softmax,
)
from multimodal_uncertainty_tpu.analysis.round1 import (  # noqa: F401
    accuracy_breakdown,
    missing_view_accuracy,
    subnetwork_kendalltau,
    trunk_pred_top,
)
from multimodal_uncertainty_tpu.analysis.robustness_tables import (  # noqa: F401
    acc_table,
    auc_table,
    ece_table,
    ensemble_overtime,
    process_predictions_food101,
    process_predictions_hatefulmeme,
)
