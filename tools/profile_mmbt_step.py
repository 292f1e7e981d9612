"""Per-op device attribution of the raw MMBT train step (VERDICT r4 #1).

Builds EXACTLY the bench_end2end_raw device step (B=32, bf16, full
ResNet-152 trunk (3,8,36,3) + BERT-base, attn_impl=auto, Adam/BertAdam as
shipped), traces N post-compile steps with jax.profiler, and prints:

  * the per-call device span of the jit_step program (the honest step
    time on a tunneled backend where wall clock includes dispatch),
  * the top-K ops by self time via tools/trace_report.py,
  * an hlo_category table with bytes_accessed -> achieved GB/s per
    category, plus an analytic-FLOPs MFU estimate.

Run on the real chip:  python tools/profile_mmbt_step.py [--steps 6]
Results land in BASELINE.md ("MMBT step attribution").

Reference hot spot being attributed: /root/reference/src/mmbt.py:15-45
(ResNet-152 full-resolution forward per batch).
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402


def analytic_step_flops(batch: int, seq_len: int, n_classes: int) -> float:
    """Training FLOPs per step (fwd+bwd ~= 3x fwd) for ResNet-152 @224 +
    BERT-base @seq_len. ResNet-152 fwd ~= 11.58 GFLOPs/img (torchvision
    profile, 2 flops per MAC); BERT-base fwd ~= 2 * 110e6 params * L-row
    tokens + attention O(L^2*d) term."""
    resnet_fwd = 11.58e9  # torchvision's 2*MACs figure for resnet152 @224
    d, layers, inter = 768, 12, 3072
    per_tok = 2 * (4 * d * d + 2 * d * inter) * layers  # qkvo + mlp matmuls
    attn = 2 * 2 * seq_len * seq_len * d * layers  # qk^T and pv
    bert_fwd = per_tok * seq_len + attn
    head = 2 * d * n_classes
    fwd = batch * (resnet_fwd + bert_fwd + head)
    return 3.0 * fwd


def main():
    import bench  # noqa: E402  (repo-root module)

    bench._enable_compile_cache()

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    import trace_report  # noqa: E402
    from multimodal_uncertainty_tpu.data.food101 import get_food101
    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.training.steps import build_train_step
    from multimodal_uncertainty_tpu.zoo import setup_mmbt

    steps = int(bench._arg_after("--steps", 6))
    batch = int(bench._arg_after("--batch", 32))
    top = int(bench._arg_after("--top", 30))
    attn_impl = bench._arg_after("--attn_impl", "auto")

    tmp = tempfile.mkdtemp(prefix="prof_mmbt_")
    bench._synth_food101_raw(tmp, n=max(2 * batch, 128))
    train, _, _, n_classes, vocab = get_food101(
        datapath=tmp, batch_size=batch, n_workers=0, max_seq_len=512,
        num_image_embeds=3,
    )
    attn_dropout = float(bench._arg_after("--attn_dropout", 0.0))
    cfg, resnet_layers = BertConfig.base(), (3, 8, 36, 3)
    if attn_dropout > 0.0:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, attention_probs_dropout_prob=attn_dropout
        )
    (text, segment, mask, imgs), y = next(iter(train))
    txt_len = int(bench._arg_after("--txt_len", 0))
    if txt_len > text.shape[1]:
        # pad to the full-size config (BASELINE.md: 160 real-corpus tokens);
        # padded positions are masked out, matching the collate contract
        def _pad(a, fill):
            out = np.full((a.shape[0], txt_len), fill, a.dtype)
            out[:, : a.shape[1]] = a
            return out

        text, segment, mask = (_pad(np.asarray(text), 0),
                               _pad(np.asarray(segment), 1),
                               _pad(np.asarray(mask), 0))
    print(f"batch: text{tuple(text.shape)} imgs{tuple(imgs.shape)} "
          f"n_classes={n_classes}", flush=True)
    setup = setup_mmbt(
        n_classes=n_classes, bert_config=cfg, resnet_layers=resnet_layers,
        num_image_embeds=3, gradient_accumulation_steps=1,
        vocab_size=vocab.vocab_sz, sample_txt_len=text.shape[1],
        seed_key=jax.random.key(0), attn_impl=attn_impl,
        dtype=jnp.bfloat16,
    )
    train_step = build_train_step(setup.bundle, setup.optimizer, donate=False)
    x_d = jax.tree_util.tree_map(jnp.asarray, (text, segment, mask, imgs))
    y_d = jnp.asarray(np.asarray(y))
    flags = jnp.asarray([False, False])
    box = [setup.state]

    def once(i):
        box[0], logs = train_step(box[0], x_d, y_d, jax.random.key(990 + i),
                                  flags)
        return logs["loss"]

    print("compiling...", flush=True)
    loss = once(0)
    print(f"compiled; loss={float(loss):.4f}", flush=True)

    td = tempfile.mkdtemp(prefix="prof_mmbt_trace_")
    jax.profiler.start_trace(td)
    barrier = None
    for i in range(steps):
        barrier = once(1 + i)
    float(barrier)  # the only reliable device barrier through the tunnel
    jax.profiler.stop_trace()

    # text seq: mmbt total seq = num_image_embeds + 2 + text tokens
    seq = text.shape[1] + 3 + 2
    print(f"(analytic seq={seq})")
    trace_report.print_step_report(
        td, steps=steps, batch=batch,
        flops=analytic_step_flops(batch, seq, n_classes), top=top,
    )
    print(f"\ntrace dir: {td}")


if __name__ == "__main__":
    main()
