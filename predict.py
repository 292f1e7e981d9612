#!/usr/bin/env python3
"""Serve a trained FLAVA-fusion checkpoint: batch predictions (+uncertainty).

Reads packed FLAVA embedding shards, runs the FusionPredictor, writes a CSV
of ensemble-mean probabilities with modality-sensitivity diagnostics.

    python predict.py --checkpoint_path results/flava/model_best_val.pt \
        --dataset hateful-meme-dataset --phase test --model_type MIMO-shuffle-instance \
        --out predictions.csv
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", required=True)
    parser.add_argument("--dataset", default="hateful-meme-dataset",
                        choices=["food101", "hateful-meme-dataset"])
    parser.add_argument("--phase", default="test")
    parser.add_argument("--model_type", default="Vanilla",
                        choices=["Vanilla", "MIMO-shuffle-instance", "MultiHead"])
    parser.add_argument("--multimodal_num_attention_heads", type=int, default=3)
    parser.add_argument("--multimodal_num_hidden_layers", type=int, default=3)
    parser.add_argument("--clstoken", action="store_true",
                        help="checkpoint was trained with learned CLS tokens")
    parser.add_argument("--avg_pool", action="store_true",
                        help="checkpoint was trained with avg-pool heads")
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--out", default="predictions.csv")
    parser.add_argument("--uncertainty", action="store_true")
    parser.add_argument("--quantize", default=None,
                        choices=["int8", "int8_weight"],
                        help="int8 serving: dynamic W8A8 or weight-only "
                             "(TPU throughput/accuracy trade-offs in "
                             "BASELINE.md)")
    parser.add_argument("--serve", type=int, default=None, metavar="PORT",
                        help="instead of batch CSV prediction, serve the "
                             "model over HTTP (POST /v1/predict with "
                             '{"img": [[...]], "txt": [[...]]}; dynamic '
                             "micro-batching; 0 = ephemeral port)")
    parser.add_argument("--serve_max_batch", type=int, default=32)
    parser.add_argument("--serve_max_wait_ms", type=float, default=5.0)
    args = parser.parse_args()

    import jax
    import numpy as np

    from multimodal_uncertainty_tpu.data.flava_encoded import (
        PackedFlavaDataset,
        collate_fn_flava,
    )
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies
    from multimodal_uncertainty_tpu.serving import FusionPredictor
    from multimodal_uncertainty_tpu.zoo import setup_flava

    datapath = os.path.join(os.environ["DATA_DIR"], args.dataset)
    if args.dataset == "food101":
        labels, _ = get_labels_and_frequencies(os.path.join(datapath, "train.jsonl"))
        n_classes = len(labels)
    else:
        n_classes = 2

    setup = setup_flava(
        model_type=args.model_type,
        n_classes=n_classes,
        multimodal_num_attention_heads=args.multimodal_num_attention_heads,
        multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
        clstoken=args.clstoken,
        avg_pool=args.avg_pool,
        seed_key=jax.random.key(0),
    )
    predictor = FusionPredictor(
        setup.model,
        args.checkpoint_path,
        template_variables={"params": setup.state.params},
        batch_buckets=(args.batch_size,),
        quantize=args.quantize,
    )

    if args.serve is not None:
        from multimodal_uncertainty_tpu.serving import fusion_micro_batcher
        from multimodal_uncertainty_tpu.server import (
            PredictionServer,
            fusion_request,
            uncertainty_result,
        )

        mb = fusion_micro_batcher(
            predictor, max_batch=args.serve_max_batch,
            max_wait_ms=args.serve_max_wait_ms,
            uncertainty=args.uncertainty,
        )
        srv = PredictionServer(
            mb, fusion_request, port=args.serve,
            encode_result=uncertainty_result if args.uncertainty else None,
        ).start()
        print(f"serving on http://{srv.host}:{srv.port} "
              f"(POST /v1/predict, GET /healthz, /statz); Ctrl-C to stop",
              flush=True)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            pass
        finally:
            srv.close()
            mb.close()
        return

    ds = PackedFlavaDataset(os.path.join(datapath, "flava_packed"), args.phase)
    rows = []
    for start in range(0, len(ds), args.batch_size):
        items = [ds[i] for i in range(start, min(start + args.batch_size, len(ds)))]
        (img, txt), y = collate_fn_flava(items)
        il = np.asarray([i.shape[0] for i, _, _ in items])
        tl = np.asarray([t.shape[0] for _, t, _ in items])
        if args.uncertainty:
            probs, diag = predictor.predict_with_uncertainty(
                img, txt, img_lengths=il, txt_lengths=tl
            )
        else:
            probs = predictor.predict(img, txt, img_lengths=il, txt_lengths=tl)
            diag = None
        for j in range(len(items)):
            row = {
                "index": start + j,
                "label": int(y[j]),
                "pred": int(probs[j].argmax()),
                **{f"p{c}": float(probs[j, c]) for c in range(probs.shape[1])},
            }
            if diag:
                row.update(
                    confidence=float(diag["confidence"][j]),
                    image_sensitivity=float(diag["image_sensitivity"][j]),
                    text_sensitivity=float(diag["text_sensitivity"][j]),
                )
            rows.append(row)

    import pandas as pd

    pd.DataFrame(rows).to_csv(args.out, index=False)
    acc = float(np.mean([r["pred"] == r["label"] for r in rows]))
    print(f"wrote {len(rows)} predictions to {args.out} (acc {acc:.4f})")


if __name__ == "__main__":
    main()
