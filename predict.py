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


def _serve_forever(srv, mb):
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


def _serving_mesh(args):
    """Device mesh for sharded serving, or None for the single-chip path."""
    dp = getattr(args, "data_parallel", 1)
    mp = getattr(args, "model_parallel", 1)
    if dp * mp <= 1:
        return None
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

    return make_mesh(dp * mp, model_parallel=mp)


def _family_predictor(args, n_classes, attn_impl="auto"):
    """Build the MMBT or ViLT predictor from template flags matching the
    train.py run (the fusion family builds through the main flow below).
    ``attn_impl="xla"`` for symbolic-batch exports (Pallas grids can't
    trace symbolic shapes)."""
    import dataclasses as dc

    import jax

    from multimodal_uncertainty_tpu import zoo

    if attn_impl == "auto" and _serving_mesh(args) is not None:
        # sharded kernel entry points partition under GSPMD on meshes
        attn_impl = (
            "pallas_sharded" if jax.default_backend() == "tpu" else "xla"
        )

    if args.framework == "mmbt":
        from multimodal_uncertainty_tpu.models.bert import BertConfig
        from multimodal_uncertainty_tpu.serving import MMBTPredictor

        if args.tiny:
            bert_cfg = dc.replace(
                BertConfig.base(), hidden_size=64, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=128,
            )
            resnet_layers = (1, 1, 1, 1)
        else:
            bert_cfg = (
                BertConfig.large()
                if args.bert_model == "bert-large-uncased"
                else BertConfig.base()
            )
            resnet_layers = (3, 8, 36, 3)
        setup = zoo.setup_mmbt(
            n_classes=n_classes, bert_config=bert_cfg,
            resnet_layers=resnet_layers,
            num_image_embeds=args.num_image_embeds,
            vocab_size=args.vocab_size, gradient_accumulation_steps=1,
            seed_key=jax.random.key(0), attn_impl=attn_impl,
        )
        variables = {"params": setup.state.params}
        if setup.state.batch_stats is not None:
            variables["batch_stats"] = setup.state.batch_stats
        mesh = _serving_mesh(args)
        return MMBTPredictor(
            setup.model, args.checkpoint_path, template_variables=variables,
            batch_buckets=(args.serve_max_batch,), quantize=args.quantize,
            temperature=args.temperature,
            mesh=mesh, tp=args.model_parallel > 1,
        )

    # vilt
    from multimodal_uncertainty_tpu.serving import ViltPredictor

    vilt_cfg = None
    if args.tiny:
        from multimodal_uncertainty_tpu.models.vilt import ViltConfig

        vilt_cfg = dc.replace(
            ViltConfig.b32(), hidden_size=64, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128,
            num_labels=n_classes, image_size=384,
        )
    setup = zoo.setup_vilt(
        n_classes=n_classes, vilt_config=vilt_cfg,
        gradient_accumulation_steps=1, seed_key=jax.random.key(0),
        attn_impl=attn_impl,
    )
    return ViltPredictor(
        setup.model, args.checkpoint_path,
        template_variables={"params": setup.state.params},
        batch_buckets=(args.serve_max_batch,), quantize=args.quantize,
        temperature=args.temperature,
        mesh=_serving_mesh(args), tp=args.model_parallel > 1,
    )


def _serve_family(args, n_classes):
    """Bring up an MMBT or ViLT checkpoint as an HTTP endpoint."""
    from multimodal_uncertainty_tpu.server import (
        PredictionServer,
        mmbt_request,
        vilt_request,
    )

    pred = _family_predictor(args, n_classes)
    if args.framework == "mmbt":
        from multimodal_uncertainty_tpu.serving import mmbt_micro_batcher

        mb = mmbt_micro_batcher(pred, max_batch=args.serve_max_batch,
                                max_wait_ms=args.serve_max_wait_ms,
                                max_pending=args.serve_max_pending,
                                uncertainty=args.uncertainty)
        decode = mmbt_request
    else:
        from multimodal_uncertainty_tpu.serving import vilt_micro_batcher

        mb = vilt_micro_batcher(pred, max_batch=args.serve_max_batch,
                                max_wait_ms=args.serve_max_wait_ms,
                                max_pending=args.serve_max_pending,
                                uncertainty=args.uncertainty)
        decode = vilt_request

    from multimodal_uncertainty_tpu.server import uncertainty_result

    srv = PredictionServer(
        mb, decode, port=args.serve,
        encode_result=uncertainty_result if args.uncertainty else None,
    ).start()
    _serve_forever(srv, mb)


def _export_family(args, n_classes):
    """Write the AOT artifact for an MMBT or ViLT checkpoint."""
    from multimodal_uncertainty_tpu.export import (
        export_mmbt_predictor,
        export_vilt_predictor,
    )

    fixed = args.export_fixed_batch
    pred = _family_predictor(
        args, n_classes, attn_impl=("auto" if fixed is not None else "xla")
    )
    kern_kw = (
        {"symbolic_batch": False, "allow_tpu_kernels": True,
         "fixed_batch": fixed}
        if fixed is not None else {}
    )
    if args.framework == "mmbt":
        export_mmbt_predictor(
            pred, args.export, txt_len=args.export_txt_len,
            image_size=224, with_ablations=args.export_ablations,
            **kern_kw,
        )
    else:
        export_vilt_predictor(
            pred, args.export, txt_len=args.export_txt_len, **kern_kw,
        )
    note = (f" (fixed batch {fixed}, Pallas kernels baked, TPU-only)"
            if fixed is not None else " (symbolic batch)")
    print(f"exported {args.framework} AOT artifact to {args.export}{note}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint_path", default=None,
                        help="trained checkpoint (required unless serving "
                             "from an AOT --artifact)")
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
    parser.add_argument("--temperature", type=float, default=1.0,
                        help="serve-time temperature scaling (fit with "
                             "analysis.calibration.fit_temperature; divides "
                             "logits before softmax, also baked into "
                             "--export artifacts)")
    parser.add_argument("--quantize", default=None,
                        choices=["int8", "int8_weight"],
                        help="int8 serving: dynamic W8A8 or weight-only "
                             "(TPU throughput/accuracy trade-offs in "
                             "BASELINE.md)")
    parser.add_argument("--serve", type=int, default=None, metavar="PORT",
                        help="instead of batch CSV prediction, serve the "
                             "model over HTTP (POST /v1/predict; dynamic "
                             "micro-batching; 0 = ephemeral port). Payload "
                             "schema per --framework: flava {img, txt} "
                             "embedding lists; mmbt {token_ids, segment, "
                             "image}; vilt processor dicts")
    parser.add_argument("--serve_max_batch", type=int, default=32)
    parser.add_argument("--serve_max_wait_ms", type=float, default=5.0)
    parser.add_argument("--serve_max_pending", type=int, default=None,
                        help="admission-control bound on queued requests "
                             "(overload returns HTTP 503 instead of "
                             "growing latency; default unbounded)")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="serve over a device mesh: shard each "
                             "coalesced batch across this many chips")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="serve with megatron tensor-parallel weights "
                             "over this many chips (composes with "
                             "--data_parallel; data*model <= chip count)")
    parser.add_argument("--framework", default="flava",
                        choices=["flava", "mmbt", "vilt"],
                        help="model family (mmbt/vilt: --serve/--export "
                             "modes; "
                             "batch CSV prediction is the flava/packed-"
                             "shard flow)")
    # mmbt/vilt serving template config (must match the checkpoint)
    parser.add_argument("--bert_model", default="bert-base-uncased",
                        choices=["bert-base-uncased", "bert-large-uncased"])
    parser.add_argument("--vocab_size", type=int, default=30522)
    parser.add_argument("--num_image_embeds", type=int, default=3)
    parser.add_argument("--tiny", action="store_true",
                        help="shrunken mmbt/vilt template (smoke tests; "
                             "must match a --tiny-trained checkpoint)")
    parser.add_argument("--n_classes", type=int, default=None,
                        help="override the dataset-derived class count "
                             "(serve a checkpoint without $DATA_DIR)")
    parser.add_argument("--export", default=None, metavar="DIR",
                        help="write an AOT serving artifact (jax.export: "
                             "StableHLO + weights, model-code-free load, "
                             "symbolic batch dim) instead of predicting")
    parser.add_argument("--export_img_len", type=int, default=224,
                        help="padded image-token length baked into --export "
                             "(FLAVA's 197 rounded to the pad multiple)")
    parser.add_argument("--export_txt_len", type=int, default=96,
                        help="padded text-token length baked into --export")
    parser.add_argument("--export_ablations", action="store_true",
                        help="mmbt --export: add a keep-mask input to the "
                             "artifact so `--artifact --serve "
                             "--uncertainty` works model-code-free "
                             "(fusion/vilt artifacts always can — their "
                             "masks are already inputs)")
    parser.add_argument("--export_fixed_batch", type=int, default=None,
                        metavar="B",
                        help="--export (any family): bake a FIXED batch "
                             "size and the Pallas attention kernels into "
                             "the artifact (TPU-only, serves at live-"
                             "kernel speed; default: symbolic batch, "
                             "portable XLA-attention program)")
    parser.add_argument("--artifact", default=None, metavar="DIR",
                        help="serve from an AOT artifact written by "
                             "--export: loads NO model code (StableHLO + "
                             "weights only); requires --serve")
    args = parser.parse_args()

    import jax
    import numpy as np

    if args.artifact is not None:
        # model-code-free serving: StableHLO + weights, no flax modules
        if args.serve is None:
            raise SystemExit("--artifact requires --serve PORT")
        from multimodal_uncertainty_tpu.export import (
            artifact_micro_batcher,
            load_exported,
        )
        from multimodal_uncertainty_tpu.server import (
            PredictionServer,
            fusion_request,
            mmbt_request,
            vilt_request,
        )

        from multimodal_uncertainty_tpu.server import uncertainty_result

        loaded = load_exported(args.artifact)
        decode = {
            "flava_fusion": fusion_request,
            "mmbt": mmbt_request,
            "vilt": vilt_request,
        }[loaded.meta.get("family", "flava_fusion")]
        mb = artifact_micro_batcher(
            loaded, max_batch=args.serve_max_batch,
            max_wait_ms=args.serve_max_wait_ms,
                                max_pending=args.serve_max_pending,
            uncertainty=args.uncertainty,
        )
        srv = PredictionServer(
            mb, decode, port=args.serve,
            encode_result=uncertainty_result if args.uncertainty else None,
        ).start()
        _serve_forever(srv, mb)
        return
    if args.checkpoint_path is None:
        parser.error("--checkpoint_path is required (unless --artifact)")

    from multimodal_uncertainty_tpu.data.flava_encoded import (
        PackedFlavaDataset,
        collate_fn_flava,
    )
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies
    from multimodal_uncertainty_tpu.serving import FusionPredictor
    from multimodal_uncertainty_tpu.zoo import setup_flava

    datapath = os.path.join(os.environ.get("DATA_DIR", ""), args.dataset)
    if args.n_classes is not None:
        n_classes = args.n_classes
    elif args.dataset == "food101":
        labels, _ = get_labels_and_frequencies(os.path.join(datapath, "train.jsonl"))
        n_classes = len(labels)
    else:
        n_classes = 2

    if args.framework != "flava":
        if args.serve is None and args.export is None:
            raise SystemExit(
                "--framework mmbt/vilt supports --serve and --export modes "
                "only (batch CSV prediction is the flava packed-shard flow)"
            )
        if args.export is not None:
            _export_family(args, n_classes)
        else:
            _serve_family(args, n_classes)
        return

    mesh = _serving_mesh(args)
    if args.export is not None and args.export_fixed_batch is None:
        # the exported program's symbolic batch dim needs the XLA attention
        # path (Pallas grids specialize on concrete batch blocks); a
        # fixed-batch export keeps the kernels and bakes them in
        attn_kw = {"attn_impl": "xla"}
    elif mesh is not None:
        # mesh serving: the sharded kernel entry points partition under
        # GSPMD (train.py makes the same selection for training meshes)
        attn_kw = {"attn_impl": (
            "pallas_sharded" if jax.default_backend() == "tpu" else "xla"
        )}
    else:
        attn_kw = {}
    setup = setup_flava(
        model_type=args.model_type,
        n_classes=n_classes,
        multimodal_num_attention_heads=args.multimodal_num_attention_heads,
        multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
        clstoken=args.clstoken,
        avg_pool=args.avg_pool,
        seed_key=jax.random.key(0),
        **attn_kw,
    )
    predictor = FusionPredictor(
        setup.model,
        args.checkpoint_path,
        template_variables={"params": setup.state.params},
        batch_buckets=(args.batch_size,),
        quantize=args.quantize,
        temperature=args.temperature,
        mesh=mesh,
        tp=args.model_parallel > 1,
    )

    if args.export is not None:
        from multimodal_uncertainty_tpu.export import export_fusion_predictor

        fixed = args.export_fixed_batch
        if fixed is not None:
            export_fusion_predictor(
                predictor, args.export,
                img_len=args.export_img_len, txt_len=args.export_txt_len,
                symbolic_batch=False, allow_tpu_kernels=True,
                fixed_batch=fixed,
            )
            shape_note = f"fixed batch {fixed}, Pallas kernels baked (TPU-only)"
        else:
            export_fusion_predictor(
                predictor, args.export,
                img_len=args.export_img_len, txt_len=args.export_txt_len,
            )
            shape_note = "symbolic batch"
        print(f"exported AOT artifact to {args.export} "
              f"(img_len={args.export_img_len}, txt_len={args.export_txt_len},"
              f" {shape_note}; load via "
              f"multimodal_uncertainty_tpu.export.load_exported)")
        return

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
                                max_pending=args.serve_max_pending,
            uncertainty=args.uncertainty,
        )
        srv = PredictionServer(
            mb, fusion_request, port=args.serve,
            encode_result=uncertainty_result if args.uncertainty else None,
        ).start()
        _serve_forever(srv, mb)
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
