"""Preemption-safe mid-epoch checkpoint/resume (training/preemption.py).

The property under test is EXACTNESS: a run killed mid-epoch and resumed
must produce bit-identical final parameters and the same history.csv as an
uninterrupted run. That requires (a) full train-state save at a batch
boundary, (b) stateless per-(seed, epoch) loader shuffles so the
interrupted epoch's permutation can be re-derived, and (c) the epoch's
running weighted sums carried across the restart.

The reference has no counterpart: its recovery points are epoch-end saves
only, and a resumed torch DataLoader draws a different shuffle.
"""
import os
import signal

import jax
import numpy as np
import pandas as pd
import pytest

from multimodal_uncertainty_tpu.data.fmnist import get_fmnist
from multimodal_uncertainty_tpu.data.loaders import ArrayLoader, MapLoader
from multimodal_uncertainty_tpu.training.callbacks import Callback
from multimodal_uncertainty_tpu.training.loop import (
    construct_default_callbacks,
    load_history,
    resume_midtrain_state,
)
from multimodal_uncertainty_tpu.training.preemption import PreemptionGuard
from multimodal_uncertainty_tpu.training.trainer import Trainer
from multimodal_uncertainty_tpu.zoo import setup_fashionmnist


def test_array_loader_iter_epoch_deterministic():
    x = np.arange(20).reshape(20, 1)
    y = np.arange(20)
    ld = ArrayLoader([x, y], batch_size=4, shuffle=True, seed=3)
    a = [b[1].tolist() for b in ld.iter_epoch(5)]
    b = [b[1].tolist() for b in ld.iter_epoch(5)]
    assert a == b  # same epoch -> same permutation, regardless of history
    c = [b[1].tolist() for b in ld.iter_epoch(6)]
    assert a != c  # different epoch -> different permutation
    # start_batch skips without changing the remainder
    assert [b[1].tolist() for b in ld.iter_epoch(5, start_batch=2)] == a[2:]
    # __iter__ counts epochs automatically and matches iter_epoch
    ld2 = ArrayLoader([x, y], batch_size=4, shuffle=True, seed=3)
    first = [b[1].tolist() for b in ld2]
    assert first == [b[1].tolist() for b in ld.iter_epoch(0)]


def test_map_loader_iter_epoch_deterministic():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i

    ld = MapLoader(DS(), 3, collate_fn=list, shuffle=True, seed=1, prefetch=0)
    a = [b for b in ld.iter_epoch(2)]
    assert a == [b for b in ld.iter_epoch(2)]
    assert [b for b in ld.iter_epoch(2, start_batch=1)] == a[1:]


def test_sigterm_sets_guard_and_uninstall_restores():
    guard = PreemptionGuard().install(signals=(signal.SIGTERM,))
    try:
        assert not guard.triggered
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.triggered
    finally:
        guard.uninstall()
    # handler restored: SIGTERM's disposition is whatever it was pre-install
    assert signal.getsignal(signal.SIGTERM) != guard._handler


class _TriggerAt(Callback):
    """Requests preemption after a given (epoch, batch) boundary."""

    def __init__(self, guard, epoch, batch):
        self.guard = guard
        self.epoch_at = epoch
        self.batch_at = batch
        self._epoch = None

    def on_epoch_begin(self, epoch, logs):
        self._epoch = epoch

    def on_batch_end(self, batch, logs):
        if self._epoch == self.epoch_at and batch == self.batch_at:
            self.guard.request()


def _fmnist_trainer(tmp_path, H):
    train, valid, _ = get_fmnist(
        batch_size=32, synthetic=True, synthetic_n=128, seed=7
    )
    setup = setup_fashionmnist(
        model_type="MultiHead", lr=0.05, total_steps=len(train) * 3,
        seed_key=jax.random.key(1), attn_impl="xla",
    )
    callbacks = construct_default_callbacks(H, str(tmp_path))
    for c in callbacks:
        c.set_save_path(str(tmp_path))
    trainer = Trainer(
        setup.bundle,
        setup.optimizer,
        setup.state,
        rng=jax.random.key(2),
        plateau_scheduler=setup.plateau,
        size_fn=setup.size_fn,
        verbose=False,
    )
    return trainer, setup, train, valid, callbacks


def _loop_kwargs(train, valid, callbacks, setup, **extra):
    kw = dict(
        valid_generator=valid,
        test_generator=valid,
        steps_per_epoch=len(train),
        validation_steps=len(valid),
        test_steps=len(valid),
        epochs=3,
        callbacks=callbacks,
        patience=10,
        scheduler_step_on=setup.scheduler_step_on,
        scheduler_metric=setup.scheduler_metric,
    )
    kw.update(extra)
    return kw


def test_midepoch_preempt_resume_is_exact(tmp_path):
    # --- run A: uninterrupted, 3 epochs -------------------------------
    dir_a = tmp_path / "a"
    dir_b = tmp_path / "b"
    os.makedirs(dir_a)
    os.makedirs(dir_b)
    HA = {}
    tr_a, setup_a, train, valid, cbs = _fmnist_trainer(dir_a, HA)
    tr_a.train_loop(train, **_loop_kwargs(train, valid, cbs, setup_a))
    params_a = jax.tree_util.tree_leaves(tr_a.state.params)

    # --- run B: preempted at epoch 2, batch 2 --------------------------
    HB = {}
    guard = PreemptionGuard()  # no signal needed: request() programmatically
    tr_b, setup_b, train_b, valid_b, cbs_b = _fmnist_trainer(dir_b, HB)
    cbs_b = list(cbs_b) + [_TriggerAt(guard, epoch=2, batch=2)]
    mid_path = os.path.join(dir_b, "model_midtrain.pt")
    tr_b.train_loop(
        train_b,
        **_loop_kwargs(train_b, valid_b, cbs_b, setup_b,
                       preemption=guard, midtrain_path=mid_path),
    )
    assert tr_b.preempted
    assert os.path.exists(mid_path)
    # only epoch 1 completed before the kill
    assert len(load_history(str(dir_b))["epoch"]) == 1

    # --- run B resumed: fresh process state, continue from the batch ---
    HB2 = load_history(str(dir_b))
    tr_b2, setup_b2, train_b2, valid_b2, cbs_b2 = _fmnist_trainer(dir_b, HB2)
    state, mid = resume_midtrain_state(
        setup_b2.state, mid_path, scheduler=setup_b2.plateau
    )
    assert int(mid["epoch"]) == 2 and int(mid["next_batch"]) == 2
    tr_b2.state = state
    tr_b2.train_loop(
        train_b2,
        **_loop_kwargs(train_b2, valid_b2, cbs_b2, setup_b2,
                       epoch_start=2, resume_mid=mid,
                       midtrain_path=mid_path),
    )

    # --- exactness ------------------------------------------------------
    params_b = jax.tree_util.tree_leaves(tr_b2.state.params)
    for pa, pb in zip(params_a, params_b):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    csv_a = pd.read_csv(os.path.join(dir_a, "history.csv"))
    csv_b = pd.read_csv(os.path.join(dir_b, "history.csv"))
    assert len(csv_a) == len(csv_b) == 3
    for col in ["epoch", "loss", "acc", "val_loss", "val_acc"]:
        np.testing.assert_allclose(
            csv_a[col].values, csv_b[col].values, rtol=1e-9, err_msg=col
        )

    # completed epochs removed the stale mid-epoch recovery point
    from multimodal_uncertainty_tpu.training.checkpoint import (
        flush_pending_writes,
    )

    flush_pending_writes()
    assert not os.path.exists(mid_path)


def test_periodic_midtrain_checkpoint(tmp_path):
    """--checkpoint_every_steps writes the recovery file during the epoch;
    epoch completion removes it (resume then goes through last_epoch)."""
    H = {}
    tr, setup, train, valid, cbs = _fmnist_trainer(tmp_path, H)
    mid_path = os.path.join(tmp_path, "model_midtrain.pt")
    seen = []

    class _Watch(Callback):
        def on_batch_end(self, batch, logs):
            from multimodal_uncertainty_tpu.training.checkpoint import (
                flush_pending_writes,
            )

            if batch == 3:
                flush_pending_writes()
                seen.append(os.path.exists(mid_path))

    tr.train_loop(
        train,
        **_loop_kwargs(train, valid, list(cbs) + [_Watch()], setup,
                       midtrain_path=mid_path, checkpoint_every_steps=2),
    )
    assert seen and all(seen)  # existed mid-epoch...
    from multimodal_uncertainty_tpu.training.checkpoint import (
        flush_pending_writes,
    )

    flush_pending_writes()
    assert not os.path.exists(mid_path)  # ...gone after the final epoch


def test_resume_midtrain_rejects_plain_checkpoint(tmp_path):
    H = {}
    tr, setup, train, valid, cbs = _fmnist_trainer(tmp_path, H)
    tr.train_loop(
        train, **_loop_kwargs(train, valid, cbs, setup, epochs=1)
    )
    from multimodal_uncertainty_tpu.training.checkpoint import (
        flush_pending_writes,
    )

    flush_pending_writes()
    with pytest.raises(ValueError, match="not a mid-epoch checkpoint"):
        resume_midtrain_state(
            setup.state, os.path.join(tmp_path, "model_last_epoch.pt")
        )


class _ListLoader:
    """Fixed batch list with the iter_epoch protocol (no shuffle)."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)

    def iter_epoch(self, epoch, start_batch=0):
        return iter(self.batches[start_batch:])


def test_midepoch_preempt_resume_exact_with_accumulation(tmp_path):
    """The hard state: preempt INSIDE a gradient-accumulation window of a
    BatchNorm model under a freeze schedule. The pending accum buffer, the
    micro-step counter, batch_stats and the traced freeze masks must all
    survive the restart bit-exactly (mid blob carries accum_grads via
    checkpointable_state)."""
    import jax.numpy as jnp

    from multimodal_uncertainty_tpu.models.bert import BertConfig
    from multimodal_uncertainty_tpu.zoo import setup_mmbt

    def make_setup():
        cfg = BertConfig(
            vocab_size=200, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=64,
            max_position_embeddings=64,
        )
        return setup_mmbt(
            n_classes=5, bert_config=cfg, num_image_embeds=3,
            resnet_layers=(1, 1, 1, 1), image_size=64,
            gradient_accumulation_steps=2, sample_txt_len=6,
            attn_impl="xla", seed_key=jax.random.key(0),
        )

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(4):
        txt = rng.integers(0, 200, size=(8, 6)).astype(np.int32)
        mask = np.ones((8, 6), np.int32)
        segment = np.ones((8, 6), np.int32)
        img = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
        y = rng.integers(0, 5, size=8).astype(np.int64)
        batches.append(((txt, mask, segment, img), y))
    train = _ListLoader(batches)

    def run(trigger, state=None, resume_mid=None, epoch_start=1, mid_path=None):
        setup = make_setup()
        tr = Trainer(
            setup.bundle, setup.optimizer,
            state if state is not None else setup.state,
            rng=jax.random.key(5), plateau_scheduler=None,
            gradient_accumulation_steps=2, size_fn=setup.size_fn,
            verbose=False,
        )
        cbs = [] if trigger is None else [trigger]
        tr.train_loop(
            train, steps_per_epoch=len(train), epochs=2, callbacks=cbs,
            patience=10, epoch_start=epoch_start,
            freeze_img=2, freeze_txt=0,  # epoch 1 frozen, epoch 2 not
            preemption=getattr(trigger, "guard", None),
            midtrain_path=mid_path, resume_mid=resume_mid,
        )
        return tr, setup

    # uninterrupted
    tr_a, _ = run(None)

    # preempt at epoch 2, batch 3: the accum window is OPEN (batch 3's
    # grads are pending in accum_grads, optimizer applies on even counts)
    guard = PreemptionGuard()
    trig = _TriggerAt(guard, epoch=2, batch=3)
    trig.guard = guard
    mid_path = str(tmp_path / "model_midtrain.pt")
    tr_b, setup_b = run(trig, mid_path=mid_path)
    assert tr_b.preempted and os.path.exists(mid_path)

    from multimodal_uncertainty_tpu.training.loop import resume_midtrain_state

    setup_c = make_setup()
    state_c, mid = resume_midtrain_state(setup_c.state, mid_path)
    assert int(mid["next_batch"]) == 3
    # the pending accumulation buffer must be non-zero in the checkpoint
    accum_norm = sum(
        float(jnp.sum(jnp.abs(l)))
        for l in jax.tree_util.tree_leaves(state_c.accum_grads)
    )
    assert accum_norm > 0, "open accum window lost across preemption"

    tr_c, _ = run(None, state=state_c, resume_mid=mid, epoch_start=2,
                  mid_path=mid_path)

    for pa, pb in zip(
        jax.tree_util.tree_leaves(
            (tr_a.state.params, tr_a.state.batch_stats, tr_a.state.opt_state)
        ),
        jax.tree_util.tree_leaves(
            (tr_c.state.params, tr_c.state.batch_stats, tr_c.state.opt_state)
        ),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    assert int(tr_a.state.step) == int(tr_c.state.step)


def test_resume_into_profiled_epoch_with_no_batches_left(tmp_path):
    """r5 review finding: a run preempted at the LAST batch of an epoch
    resumes with start_batch == n_steps, so the profiled epoch's batch
    loop body never runs and losses is empty — the profiler stop path
    must not index losses[-1] (it used to IndexError and leak the open
    trace session)."""
    d = tmp_path / "run"
    os.makedirs(d)
    H = {}
    guard = PreemptionGuard()
    tr, setup, train, valid, cbs = _fmnist_trainer(d, H)
    n_batches = len(train)
    cbs = list(cbs) + [_TriggerAt(guard, epoch=2, batch=n_batches)]
    mid_path = os.path.join(d, "model_midtrain.pt")
    tr.train_loop(
        train,
        **_loop_kwargs(train, valid, cbs, setup,
                       preemption=guard, midtrain_path=mid_path),
    )
    assert tr.preempted

    H2 = load_history(str(d))
    tr2, setup2, train2, valid2, cbs2 = _fmnist_trainer(d, H2)
    state, mid = resume_midtrain_state(
        setup2.state, mid_path, scheduler=setup2.plateau
    )
    assert int(mid["next_batch"]) == n_batches  # zero batches left
    tr2.state = state
    prof = str(tmp_path / "trace")
    tr2.train_loop(
        train2,
        **_loop_kwargs(train2, valid2, cbs2, setup2,
                       epoch_start=2, resume_mid=mid,
                       midtrain_path=mid_path,
                       profile_dir=prof, profile_epoch=2),
    )
    # the run completed (no IndexError) and the trace session was closed
    assert len(load_history(str(d))["epoch"]) == 3
    import glob

    assert glob.glob(prof + "/**/*.trace.json.gz", recursive=True)


def test_preempt_at_last_batch_resumes_through_evals(tmp_path):
    """Signal on the epoch's final batch: the in-loop check skips it (the
    epoch's train phase is complete), so the post-train check saves with
    next_batch == n_steps and resume runs just the evals + epoch-end
    callbacks — still bit-identical to the uninterrupted run."""
    dir_a = tmp_path / "a"
    dir_b = tmp_path / "b"
    os.makedirs(dir_a)
    os.makedirs(dir_b)

    HA = {}
    tr_a, setup_a, train, valid, cbs = _fmnist_trainer(dir_a, HA)
    tr_a.train_loop(train, **_loop_kwargs(train, valid, cbs, setup_a))

    HB = {}
    guard = PreemptionGuard()
    tr_b, setup_b, train_b, valid_b, cbs_b = _fmnist_trainer(dir_b, HB)
    n_batches = len(train_b)
    cbs_b = list(cbs_b) + [_TriggerAt(guard, epoch=2, batch=n_batches)]
    mid_path = os.path.join(dir_b, "model_midtrain.pt")
    tr_b.train_loop(
        train_b,
        **_loop_kwargs(train_b, valid_b, cbs_b, setup_b,
                       preemption=guard, midtrain_path=mid_path),
    )
    assert tr_b.preempted
    # epoch 2's history row was NOT written (eval never ran)
    assert len(load_history(str(dir_b))["epoch"]) == 1

    HB2 = load_history(str(dir_b))
    tr_b2, setup_b2, train_b2, valid_b2, cbs_b2 = _fmnist_trainer(dir_b, HB2)
    state, mid = resume_midtrain_state(
        setup_b2.state, mid_path, scheduler=setup_b2.plateau
    )
    assert int(mid["next_batch"]) == n_batches  # train phase complete
    tr_b2.state = state
    tr_b2.train_loop(
        train_b2,
        **_loop_kwargs(train_b2, valid_b2, cbs_b2, setup_b2,
                       epoch_start=2, resume_mid=mid,
                       midtrain_path=mid_path),
    )

    for pa, pb in zip(
        jax.tree_util.tree_leaves(tr_a.state.params),
        jax.tree_util.tree_leaves(tr_b2.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    csv_a = pd.read_csv(os.path.join(dir_a, "history.csv"))
    csv_b = pd.read_csv(os.path.join(dir_b, "history.csv"))
    assert len(csv_a) == len(csv_b) == 3
    np.testing.assert_allclose(
        csv_a["val_acc"].values, csv_b["val_acc"].values, rtol=1e-9
    )
    np.testing.assert_allclose(
        csv_a["loss"].values, csv_b["loss"].values, rtol=1e-9
    )
