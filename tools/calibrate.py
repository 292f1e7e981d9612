#!/usr/bin/env python3
"""Fit temperature scaling on saved prediction artifacts.

Consumes the ``eval_prediction_saving`` contract — ``*_predictions.npy``
per-head logits (S, E, C) or reduced (S, C), plus ``*_labels.npy`` — fits
the NLL-optimal temperature on the validation artifact, reports ECE/NLL
before vs after (on the test artifact when given: the honest
fit-on-val/report-on-test protocol), and prints the T to pass to serving
(``predict.py --temperature``).

    python tools/calibrate.py \
        --val_predictions results/run/model_best_val_predictions.npy \
        --val_labels      results/run/model_best_val_labels.npy \
        [--test_predictions ... --test_labels ...] \
        [--reliability_csv out.csv] [--n_bins 15]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_uncertainty_tpu.analysis.calibration import (  # noqa: E402
    calibration_report,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--val_predictions", required=True,
                    help="(S, E, C) or (S, C) logits .npy")
    ap.add_argument("--val_labels", required=True)
    ap.add_argument("--test_predictions", default=None)
    ap.add_argument("--test_labels", default=None)
    ap.add_argument("--n_bins", type=int, default=15)
    ap.add_argument("--reliability_csv", default=None,
                    help="write the reliability curve at the RECOMMENDED "
                         "serving temperature (the fitted T only when the "
                         "guard accepts it)")
    args = ap.parse_args()

    if (args.test_predictions is None) != (args.test_labels is None):
        ap.error("--test_predictions and --test_labels go together")

    val_logits = np.load(args.val_predictions)
    val_labels = np.load(args.val_labels)
    test_logits = (
        np.load(args.test_predictions) if args.test_predictions else None
    )
    test_labels = np.load(args.test_labels) if args.test_labels else None

    rep = calibration_report(
        val_logits, val_labels, test_logits, test_labels, n_bins=args.n_bins
    )
    curve = rep.pop("reliability_after")
    if args.reliability_csv:
        rows = np.column_stack([
            curve["bin_edges"][:-1], curve["bin_edges"][1:],
            curve["confidence"], curve["accuracy"], curve["count"],
        ])
        np.savetxt(
            args.reliability_csv, rows, delimiter=",",
            header="bin_lo,bin_hi,confidence,accuracy,count", comments="",
        )
    rep["eval_split"] = "test" if test_logits is not None else "val"
    # Serve the GUARDED recommendation, not the raw fit: the NLL-optimal T
    # can degrade max-prob ECE (analysis/calibration.py
    # ``recommend_temperature``), in which case T=1.0 is printed instead.
    rep["serve_with"] = (
        f"predict.py --temperature {rep['recommended_temperature']:.4f}"
    )
    if rep["guard"] is not None:
        print(
            f"WARNING: fitted T={rep['temperature']:.4f} rejected — "
            f"{rep['guard']}",
            file=sys.stderr,
        )
    print(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
