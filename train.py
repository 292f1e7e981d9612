#!/usr/bin/env python3
"""Train multimodal classifiers (flava / mmbt / vilt) — CLI parity with the
reference ``train.py`` (flags mirror ``train.py:31-117``; behavior per
SURVEY.md §3.1-3.2). TPU-native internals: jitted train/eval steps, PRNG-keyed
MIMO data forming, msgpack checkpoints under the reference's file names.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logger = logging.getLogger(__name__)


def get_args(parser: argparse.ArgumentParser) -> None:
    # general args (reference train.py:31-45)
    parser.add_argument("--use_gpu", action="store_true",
                        help="kept for CLI parity; accelerator use is automatic")
    parser.add_argument("--device", default=0, type=int)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--resume", action="store_true")

    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=0.1)
    parser.add_argument("--n_epochs", type=int, default=100)
    parser.add_argument("--patience", type=int, default=10)

    parser.add_argument("--dataset", type=str,
                        choices=["food101", "hateful-meme-dataset"],
                        default="hateful-meme-dataset")
    parser.add_argument("--sample_size", type=int, default=None)

    parser.add_argument("--framework", type=str, choices=["vilt", "flava", "mmbt"])
    parser.add_argument("--model_type", type=str, default="Vanilla",
                        choices=["Vanilla", "MIMO-shuffle-instance", "MultiHead"])

    # flava mm encoder args
    parser.add_argument("--multimodal_num_attention_heads", type=int, default=3)
    parser.add_argument("--multimodal_num_hidden_layers", type=int, default=3)
    parser.add_argument("--clstoken", action="store_true")
    parser.add_argument("--dropout", type=float, default=0)
    parser.add_argument("--avg_pool", action="store_true")
    parser.add_argument("--wd", type=float, default=0.001)

    # vilt/mmbt scheduler args
    parser.add_argument("--lr_patience", type=int, default=2)
    parser.add_argument("--lr_factor", type=float, default=0.5)
    parser.add_argument("--gradient_accumulation_steps", type=int, default=40)

    # mmbt args
    parser.add_argument("--bert_model", type=str, default="bert-base-uncased",
                        choices=["bert-base-uncased", "bert-large-uncased"])
    parser.add_argument("--drop_img_percent", type=float, default=0.0)
    parser.add_argument("--embed_sz", type=int, default=300)
    parser.add_argument("--freeze_img", type=int, default=3)
    parser.add_argument("--freeze_txt", type=int, default=5)
    parser.add_argument("--hidden", nargs="*", type=int, default=[])
    parser.add_argument("--hidden_sz", type=int, default=768)
    parser.add_argument("--img_embed_pool_type", type=str, default="avg",
                        choices=["max", "avg"])
    parser.add_argument("--img_hidden_sz", type=int, default=2048)
    parser.add_argument("--include_bn", type=int, default=True)
    parser.add_argument("--max_seq_len", type=int, default=512)
    parser.add_argument("--n_workers", type=int, default=0)
    parser.add_argument("--num_image_embeds", type=int, default=3)
    parser.add_argument("--warmup", type=float, default=0.1)

    # TPU-native extras (not in the reference)
    parser.add_argument("--vocab_file", type=str, default=None,
                        help="local BERT vocab.txt for mmbt/vilt")
    parser.add_argument("--bert_weights", type=str, default=None,
                        help="local torch state dict for BERT pretrained init")
    parser.add_argument("--resnet_weights", type=str, default=None,
                        help="local torch state dict for ResNet-152 init")
    parser.add_argument("--vilt_weights", type=str, default=None,
                        help="local torch state dict for ViLT pretrained init "
                             "(reference: dandelin/vilt-b32-mlm, train.py:166)")
    parser.add_argument("--fast_decode", action="store_true",
                        help="JPEG DCT-scaled decode (~2x host pipeline; "
                             "slightly different resample than torchvision)")
    parser.add_argument("--batch_decode", action="store_true",
                        help="decode images at collate time in one native "
                             "C++ thread-pool call (GIL-free; scales with "
                             "host cores). Implies the --fast_decode "
                             "DCT-scaled resample (see DEVIATIONS.md)")
    parser.add_argument("--device_prefetch", action="store_true",
                        help="background-thread host->device transfer of "
                             "upcoming batches (overlaps with the running "
                             "step)")
    parser.add_argument("--transfer_quant", choices=["none", "int8"],
                        default="none",
                        help="ship floating embedding batches to the chip "
                             "as int8 + per-token scales and dequantize on "
                             "device: 0.5x the transfer bytes of bf16 "
                             "shards (0.25x of f32). Lossy (int8 rounding), "
                             "opt-in — see DEVIATIONS.md")
    parser.add_argument("--checkpoint_every_steps", type=int, default=None,
                        help="also write a mid-epoch recovery checkpoint "
                             "(model_midtrain.pt) every N batches; SIGTERM "
                             "preemption writes the same artifact at the "
                             "next batch boundary regardless. --resume "
                             "picks it up and continues from the exact "
                             "batch (training/preemption.py)")
    parser.add_argument("--keep_epoch_ckpts", type=int, default=None,
                        help="retain only the newest N model_epoch_*.pt "
                             "(best/last never pruned; default: keep all, "
                             "reference parity)")
    parser.add_argument("--ckpt_backend", default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="msgpack = reference-named single files "
                             "(model_*.pt); orbax = sharding-aware "
                             "directory saves under save_path/orbax — "
                             "required for TP-sharded multi-host "
                             "checkpointing, restores directly onto the "
                             "mesh. Recovery is epoch-granular (no "
                             "model_midtrain.pt)")
    parser.add_argument("--attn_impl", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "pallas_interpret",
                                 "pallas_sharded", "pallas_interpret_sharded",
                                 "ring", "ring_interpret"])
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 activations (flava/mmbt paths)")
    parser.add_argument("--attention_probs_dropout", type=float, default=0.0,
                        help="mmbt/vilt: dropout on the attention "
                             "PROBABILITIES during training (torch BERT "
                             "default 0.1) — the opt-in reference-exact "
                             "parity regime; 0 (default) keeps attention "
                             "one fused kernel. Eval-identical either way")
    # guided/random diversity training signal (training_guided.gin /
    # training_random.gin intent — see ops/diversity.py)
    parser.add_argument("--diversity", type=str, default="none",
                        choices=["none", "guided", "random"])
    parser.add_argument("--diversity_coef", type=float, default=0.1)
    parser.add_argument("--tiny", action="store_true",
                        help="shrunken mmbt/vilt configs for smoke tests")
    parser.add_argument("--ece", action="store_true",
                        help="log expected calibration error per epoch")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialize transformer blocks (less memory)")
    parser.add_argument("--fast_dw", action="store_true",
                        help="EXPERIMENTAL: route Linear weight gradients "
                             "through the Pallas dW kernel (ops/dw.py). "
                             "Numerics identical; measured 30%% SLOWER on "
                             "the flagship step (breaks XLA backward "
                             "fusions — see BASELINE.md dW-wall section)")
    parser.add_argument("--modality", type=str, default="both",
                        choices=["both", "image", "text"],
                        help="mmbt unimodal-baseline training (keep-mask)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write an XLA device trace of one post-compile "
                             "epoch here (jax.profiler); inspect with "
                             "tools/trace_report.py or TensorBoard")
    parser.add_argument("--profile_epoch", type=int, default=2,
                        help="which epoch to trace (default 2: epoch 1 "
                             "pays compilation)")
    # multi-chip mesh (TPU-native scaling; reference is single-device)
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="devices on the 'data' mesh axis")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="devices on the 'model' (tensor-parallel) axis")
    parser.add_argument("--sequence_parallel", type=int, default=1,
                        help="devices on the 'seq' axis: ring attention "
                             "(ops/ring.py) shards the fusion sequence and "
                             "rotates K/V around the ICI ring — for "
                             "contexts past one chip's HBM. Requires the "
                             "padded img+txt length to be a multiple of "
                             "128*sequence_parallel")
    parser.add_argument("--pipeline_parallel", type=int, default=1,
                        help="GPipe pipeline stages over the 'model' mesh "
                             "axis (parallel/pipeline.py): the fusion "
                             "mm_encoder or the MMBT BERT encoder (the "
                             "attention mask rides the microbatch stream) "
                             "split into layers/P consecutive blocks per "
                             "stage, activations hop the ICI ring, "
                             "M=--pipeline_microbatches microbatches fill "
                             "the bubble. flava|mmbt; requires dropout 0; "
                             "composes with --data_parallel; exclusive "
                             "with --model_parallel/--sequence_parallel")
    parser.add_argument("--pipeline_microbatches", type=int, default=None,
                        help="GPipe M (default: pipeline_parallel)")
    parser.add_argument("--fsdp", action="store_true",
                        help="FSDP/ZeRO-3: shard params + optimizer moments "
                             "over the 'data' axis (weights all-gather at "
                             "use, grads reduce-scatter); composes with "
                             "--model_parallel")
    # multi-HOST (one process per host; parallel/multihost.py). On TPU pods
    # all three are discovered from the environment — pass --num_processes 0
    # to trigger auto-init; on CPU fleets pass them explicitly.
    parser.add_argument("--compile_cache", type=str,
                        default=os.environ.get("MMU_COMPILE_CACHE") or None,
                        help="persistent XLA compilation-cache directory "
                             "(jax_compilation_cache_dir): restarts and "
                             "preemption resumes skip recompilation; "
                             "defaults from $MMU_COMPILE_CACHE")
    parser.add_argument("--coordinator_address", type=str, default=None,
                        help="host:port of process 0 (jax.distributed)")
    parser.add_argument("--num_processes", type=int, default=1,
                        help="total training processes (0 = auto-discover)")
    parser.add_argument("--process_id", type=int, default=None)


def add_conditional_args(args):
    """Reference ``add_conditional_args`` (train.py:92-117)."""
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies

    args.datapath = os.path.join(os.environ["DATA_DIR"], args.dataset)
    if args.dataset == "food101":
        args.labels, _ = get_labels_and_frequencies(
            os.path.join(args.datapath, "train.jsonl")
        )
        args.n_classes = len(args.labels)
        args.auc = False
        args.error_cases_remover = False
        args.name_extractor = lambda x: x.split(".")[0]
    elif args.dataset == "hateful-meme-dataset":
        args.labels = list(range(2))
        args.n_classes = 2
        args.auc = True
        args.error_cases_remover = True
        args.name_extractor = lambda x: x.split("/")[-1].split(".")[0]

    if args.avg_pool:
        assert args.model_type != "Vanilla", "avg_pool is NOT supported for Vanilla"
    return args


def main():
    parser = argparse.ArgumentParser(description="Train Models")
    get_args(parser)
    args, remaining = parser.parse_known_args()
    assert remaining == [], remaining
    args = add_conditional_args(args)

    # mirror the console transcript (config echo, progress, warnings) into
    # the run directory — the operational record next to the checkpoints
    from multimodal_uncertainty_tpu.utils.logging_utils import TeeLog

    os.makedirs(args.save_path, exist_ok=True)
    TeeLog(os.path.join(args.save_path, "out.log")).install()

    import jax
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.data import flava_encoded, vilt_data
    from multimodal_uncertainty_tpu.data.food101 import get_food101
    from multimodal_uncertainty_tpu.training.loop import (
        construct_default_callbacks,
        load_history,
        resume_midtrain_state,
        resume_train_state,
    )
    from multimodal_uncertainty_tpu.training.preemption import PreemptionGuard
    from multimodal_uncertainty_tpu.training.trainer import Trainer
    from multimodal_uncertainty_tpu.utils.seeding import set_seed
    from multimodal_uncertainty_tpu import zoo

    # latch SIGTERM from the very start: a preemption notice arriving during
    # import/compile (tens of seconds on TPU) must not kill the process
    # before the trainer gets a chance to stop at a batch boundary
    guard = PreemptionGuard().install()

    if args.compile_cache:
        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if args.coordinator_address is not None or args.num_processes != 1:
        from multimodal_uncertainty_tpu.parallel import multihost

        # num_processes passes through unmodified: 0 means auto-discover
        # (parallel/multihost.py calls jax.distributed.initialize() bare)
        multihost.initialize(
            args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    root_key = set_seed(args.seed)
    if args.pipeline_parallel > 1:
        if args.framework not in ("flava", "mmbt"):
            raise SystemExit(
                "--pipeline_parallel is wired for the fusion and MMBT "
                "families (--framework flava|mmbt)")
        if args.model_parallel > 1 or args.sequence_parallel > 1:
            raise SystemExit(
                "--pipeline_parallel uses the 'model' mesh axis for "
                "stages; it is exclusive with --model_parallel and "
                "--sequence_parallel")
        if args.dropout:
            raise SystemExit("--pipeline_parallel requires --dropout 0 "
                             "(stages run rng-free)")
        if args.framework == "mmbt" and args.attention_probs_dropout:
            raise SystemExit(
                "--pipeline_parallel requires --attention_probs_dropout 0 "
                "(the pipelined BERT stages run rng-free)")
    n_mesh = (args.data_parallel * args.model_parallel
              * args.sequence_parallel * args.pipeline_parallel)
    mesh = None
    if n_mesh > 1:
        # built BEFORE model setup: the ring route (and flax init, which
        # traces the forward) needs the registered mesh
        from multimodal_uncertainty_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(
            n_mesh,
            model_parallel=args.model_parallel * args.pipeline_parallel,
            sequence_parallel=args.sequence_parallel,
        )
    args.seq_pad_multiple = None
    if args.sequence_parallel > 1:
        from multimodal_uncertainty_tpu.ops.attention import (
            configure_ring_mesh,
        )

        if args.framework != "flava":
            raise SystemExit(
                "--sequence_parallel is wired for the fusion family "
                "(--framework flava)"
            )
        if args.clstoken:
            raise SystemExit(
                "--sequence_parallel is incompatible with --clstoken: the "
                "E prepended CLS tokens break the 128-multiple ring shards"
            )
        # each modality pads to 128*sp so img+txt concatenates into
        # 128-multiple per-chip sequence shards (ops/ring.py)
        args.seq_pad_multiple = 128 * args.sequence_parallel
        if args.attn_impl in ("auto", "ring", "ring_interpret"):
            args.attn_impl = (
                "ring" if jax.default_backend() == "tpu"
                else "ring_interpret"
            )
        else:
            raise SystemExit(
                f"--sequence_parallel needs attn_impl ring/auto, got "
                f"{args.attn_impl!r}"
            )
        configure_ring_mesh(mesh)
    if args.pipeline_parallel > 1 and args.attn_impl == "auto":
        # train attention runs INSIDE the pipeline shard_map (plain kernels
        # fine) but masked eval runs inline under the GSPMD mesh — xla is
        # the one impl valid in both regimes; power users may override
        args.attn_impl = "xla"
    if args.data_parallel * args.model_parallel > 1 and args.attn_impl in (
        "auto", "pallas"
    ):
        # pallas_call doesn't auto-partition under GSPMD; on meshes the
        # kernels run through their custom_partitioning wrappers
        # (batch-partitioned; ops/attention.py) instead.
        args.attn_impl = (
            "pallas_sharded" if jax.default_backend() == "tpu" else "xla"
        )
    print(args)

    def load_sd(path):
        if path is None:
            return None
        import torch

        return {
            k: v.numpy()
            for k, v in torch.load(path, map_location="cpu",
                                   weights_only=True).items()
        }

    if args.framework == "mmbt":
        assert args.dataset == "food101", "MMBT is only supported for food101"
        train, valid, test, n_classes, vocab = get_food101(
            vocab_file=args.vocab_file,
            datapath=args.datapath,
            batch_size=args.batch_size,
            drop_img_percent=args.drop_img_percent,
            max_seq_len=args.max_seq_len,
            num_image_embeds=args.num_image_embeds,
            n_workers=args.n_workers,
            sample_size=args.sample_size,
            seed=args.seed,
            fast_decode=args.fast_decode,
            batch_decode=args.batch_decode,
        )
        args.n_classes = n_classes
        total_steps = len(train) / args.gradient_accumulation_steps * args.n_epochs

        from multimodal_uncertainty_tpu.models.bert import BertConfig

        if args.tiny:
            import dataclasses as _dc

            bert_cfg = _dc.replace(
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

        if args.attention_probs_dropout > 0:
            import dataclasses as _dc

            bert_cfg = _dc.replace(
                bert_cfg,
                attention_probs_dropout_prob=args.attention_probs_dropout,
            )
        mmbt_pipe = {}
        if args.pipeline_parallel > 1:
            # the pipelined BERT stages run rng-free: --dropout 0 (gated
            # above) governs every dropout site for the run, so the bert
            # config's hidden dropout and the embeddings dropout are
            # zeroed too (setup_mmbt rejects anything else)
            import dataclasses as _dc

            bert_cfg = _dc.replace(bert_cfg, hidden_dropout_prob=0.0)
            mmbt_pipe = dict(
                dropout=0.0,
                pipeline_parallel=args.pipeline_parallel,
                pipeline_mesh=mesh,
                pipeline_microbatches=args.pipeline_microbatches,
            )
        setup = zoo.setup_mmbt(
            **mmbt_pipe,
            n_classes=n_classes,
            lr=args.lr,
            warmup=args.warmup,
            total_steps=total_steps,
            lr_patience=args.lr_patience,
            lr_factor=args.lr_factor,
            num_image_embeds=args.num_image_embeds,
            bert_config=bert_cfg,
            resnet_layers=resnet_layers,
            img_embed_pool_type=args.img_embed_pool_type,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            vocab_size=vocab.vocab_sz,
            modality=args.modality,
            seed_key=root_key,
            attn_impl=args.attn_impl,
            dtype=jnp.bfloat16 if args.bf16 else None,
            remat=args.remat,
            fast_dw=args.fast_dw,
            pretrained_bert_sd=load_sd(args.bert_weights),
            pretrained_resnet_sd=load_sd(args.resnet_weights),
        )
    elif args.framework == "vilt":
        train, valid, test = vilt_data.get_dataset_vilt(args, args.datapath)
        vilt_cfg = None
        if args.tiny:
            import dataclasses as _dc

            from multimodal_uncertainty_tpu.models.vilt import ViltConfig

            vilt_cfg = _dc.replace(
                ViltConfig.b32(), hidden_size=64, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=128,
                num_labels=args.n_classes, image_size=384,
            )
        if args.attention_probs_dropout > 0:
            import dataclasses as _dc

            from multimodal_uncertainty_tpu.models.vilt import ViltConfig

            base_cfg = vilt_cfg or _dc.replace(
                ViltConfig.b32(), num_labels=args.n_classes
            )
            vilt_cfg = _dc.replace(
                base_cfg,
                attention_probs_dropout_prob=args.attention_probs_dropout,
            )
        setup = zoo.setup_vilt(
            n_classes=args.n_classes,
            lr=args.lr,
            lr_patience=args.lr_patience,
            lr_factor=args.lr_factor,
            vilt_config=vilt_cfg,
            gradient_accumulation_steps=args.gradient_accumulation_steps,
            seed_key=root_key,
            attn_impl=args.attn_impl,
            fast_dw=args.fast_dw,
            pretrained_vilt_sd=load_sd(args.vilt_weights),
        )
    elif args.framework == "flava":
        train, valid, test = flava_encoded.get_dataset_flava(args, args.datapath)
        flava_extra = {}
        if args.seq_pad_multiple:
            # init-trace shapes must honor the ring pad (the collate pads
            # real batches the same way)
            p = args.seq_pad_multiple

            def _r128(n):
                return ((n + p - 1) // p) * p

            flava_extra["sample_shapes"] = (
                (args.batch_size, _r128(197)), (args.batch_size, _r128(77))
            )
        setup = zoo.setup_flava(
            model_type=args.model_type,
            **flava_extra,
            n_classes=args.n_classes,
            lr=args.lr,
            wd=args.wd,
            n_epochs=args.n_epochs,
            steps_per_epoch=len(train),
            multimodal_num_attention_heads=args.multimodal_num_attention_heads,
            multimodal_num_hidden_layers=args.multimodal_num_hidden_layers,
            dropout=args.dropout,
            clstoken=args.clstoken,
            avg_pool=args.avg_pool,
            diversity=args.diversity,
            diversity_coef=args.diversity_coef,
            seed_key=root_key,
            attn_impl=args.attn_impl,
            remat=args.remat,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            fast_dw=args.fast_dw,
            pipeline_parallel=args.pipeline_parallel,
            pipeline_mesh=mesh if args.pipeline_parallel > 1 else None,
            pipeline_microbatches=args.pipeline_microbatches,
        )
    else:
        raise SystemExit("--framework is required (vilt | flava | mmbt)")

    os.makedirs(args.save_path, exist_ok=True)
    history_csv_path = os.path.join(args.save_path, "history.csv")

    use_orbax = args.ckpt_backend == "orbax"
    orbax_dir = os.path.join(args.save_path, "orbax")
    midtrain_path = (
        None if use_orbax else os.path.join(args.save_path, "model_midtrain.pt")
    )
    state = setup.state
    resume_mid = None
    if use_orbax:
        # restore happens AFTER the mesh/shard_state block below so arrays
        # land directly on their target shardings (no host gather)
        from multimodal_uncertainty_tpu.training.orbax_io import latest_step

        last = latest_step(orbax_dir)
        if args.resume and last is None:
            logger.warning("--resume: no orbax checkpoint in %s; starting "
                           "fresh", orbax_dir)
            args.resume = False
        if args.resume:
            H = load_history(args.save_path) if os.path.exists(
                history_csv_path
            ) else {"epoch": []}
            # replay only up to the restored step: if an async save was
            # lost (crash between history write and checkpoint finalize),
            # history has one more row than the checkpoint and the epoch
            # re-runs — trim so it isn't double-logged
            H = {k: list(v)[:last] for k, v in H.items()}
            epoch_start = last + 1
        else:
            H = {}
            if os.path.exists(history_csv_path):
                os.remove(history_csv_path)
            epoch_start = 1
    elif args.resume and not (
        os.path.exists(midtrain_path)
        or os.path.exists(os.path.join(args.save_path, "model_last_epoch.pt"))
    ):
        # preempted before any checkpoint landed (e.g. during the first
        # epoch's compile): nothing to restore — start fresh instead of
        # crashing, so orchestrators can always restart with --resume
        logger.warning("--resume: no checkpoint in %s; starting fresh",
                       args.save_path)
        args.resume = False
    if not use_orbax and args.resume:
        H = load_history(args.save_path) if os.path.exists(history_csv_path) else {"epoch": []}
        epoch_start = len(H["epoch"]) + 1
        if os.path.exists(midtrain_path):
            # interrupted mid-epoch: continue that epoch from its recorded
            # batch (exact — see training/preemption.py). A stale midtrain
            # file (epoch already completed per history.csv) is ignored.
            state, resume_mid = resume_midtrain_state(
                state, midtrain_path, scheduler=setup.plateau
            )
            if int(resume_mid["epoch"]) != epoch_start:
                logger.warning(
                    "ignoring stale %s (epoch %d; history says resume at %d)",
                    midtrain_path, int(resume_mid["epoch"]), epoch_start,
                )
                resume_mid = None
                state = resume_train_state(
                    setup.state,
                    os.path.join(args.save_path, "model_last_epoch.pt"),
                    scheduler=setup.plateau,
                )
        else:
            state = resume_train_state(
                state, os.path.join(args.save_path, "model_last_epoch.pt"),
                scheduler=setup.plateau,
            )
    elif not use_orbax:
        H = {}
        if os.path.exists(history_csv_path):
            logger.info("Removing %s", history_csv_path)
            os.remove(history_csv_path)
        epoch_start = 1

    put_batch = None
    state_shardings = None
    if args.fsdp and n_mesh <= 1:
        logger.warning("--fsdp needs a multi-device mesh "
                       "(--data_parallel/--model_parallel); ignoring")
    if n_mesh > 1:
        from multimodal_uncertainty_tpu.parallel.sharding import (
            put_batch_fn,
            shard_state,
            state_sharding_tree,
        )

        state = shard_state(
            state, mesh, tp=args.model_parallel > 1, fsdp=args.fsdp
        )
        if args.fsdp:
            # pin the updated state to the FSDP layout inside the step
            state_shardings = state_sharding_tree(
                state, mesh, tp=args.model_parallel > 1, fsdp=True
            )
        if jax.process_count() > 1:
            # per-process batch construction: every host feeds its own
            # contiguous row-block of the global batch
            from multimodal_uncertainty_tpu.parallel.multihost import (
                put_global_batch_fn,
            )

            put_batch = put_global_batch_fn(mesh)
        else:
            put_batch = put_batch_fn(mesh)
        logger.info("mesh: %s", dict(mesh.shape))
    if args.transfer_quant == "int8":
        # wrap whatever placement was chosen above (single-device, DP mesh,
        # multi-host): quantize on the host, place the int8+scales wire
        # format, dequantize on device
        from multimodal_uncertainty_tpu.data.transfer_quant import (
            Int8TransferPut,
        )

        put_batch = Int8TransferPut(base_put=put_batch)

    primary = jax.process_index() == 0
    if use_orbax and args.resume:
        # now that the state sits on its final shardings, restore in place
        from multimodal_uncertainty_tpu.training.orbax_io import (
            restore_train_state,
        )

        if setup.plateau is not None:
            state, extra = restore_train_state(
                state, orbax_dir, extra_template=setup.plateau.state_dict()
            )
            setup.plateau.load_state_dict(
                {k: type(getattr(setup.plateau, k))(v)
                 for k, v in extra.items()}
            )
        else:
            state = restore_train_state(state, orbax_dir)

    if use_orbax:
        from multimodal_uncertainty_tpu.training.loop import (
            construct_orbax_callbacks,
        )

        # orbax saves are collective: the checkpoint callback runs on
        # EVERY process; history/best.json keep a single writer
        callbacks = construct_orbax_callbacks(
            H, args.save_path, checkpoint_monitor="val_acc",
            keep_epoch_ckpts=args.keep_epoch_ckpts, primary=primary,
        )
    else:
        callbacks = (
            construct_default_callbacks(
                H, args.save_path, checkpoint_monitor="val_acc",
                keep_epoch_ckpts=args.keep_epoch_ckpts,
            )
            if primary  # one writer: checkpoints/history only on process 0
            else []
        )
    for clbk in callbacks:
        clbk.set_save_path(args.save_path)

    trainer = Trainer(
        setup.bundle,
        setup.optimizer,
        state,
        rng=jax.random.fold_in(root_key, 1),
        plateau_scheduler=setup.plateau,
        gradient_accumulation_steps=(
            args.gradient_accumulation_steps if args.framework in ("mmbt", "vilt")
            else 1
        ),
        size_fn=setup.size_fn,
        verbose=primary,
        put_batch_fn=put_batch,
        device_prefetch=args.device_prefetch,
        state_shardings=state_shardings,
    )
    trainer.train_loop(
        train,
        valid_generator=valid,
        test_generator=test,
        steps_per_epoch=len(train),
        validation_steps=len(valid),
        test_steps=len(test),
        epochs=args.n_epochs,
        callbacks=callbacks,
        patience=args.patience,
        epoch_start=epoch_start,
        scheduler_step_on=setup.scheduler_step_on,
        scheduler_metric=setup.scheduler_metric,
        auc=args.auc,
        ece=args.ece,
        freeze_img=args.freeze_img,
        freeze_txt=args.freeze_txt,
        profile_dir=args.profile_dir,
        profile_epoch=args.profile_epoch,
        preemption=guard,
        midtrain_path=midtrain_path if primary else None,
        checkpoint_every_steps=args.checkpoint_every_steps,
        resume_mid=resume_mid,
    )
    if getattr(trainer, "preempted", False):
        logger.warning("run preempted; restart with --resume to continue")


if __name__ == "__main__":
    main()
