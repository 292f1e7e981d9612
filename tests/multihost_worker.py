"""Worker process for tests/test_multihost.py (not a test module).

Runs a short FashionMNIST MIMO training on an 8-CPU-device 'data' mesh,
either as ONE process owning all 8 devices or as one of TWO processes
owning 4 each (jax.distributed over a localhost coordinator). Saves final
params + per-epoch losses so the test can compare the two topologies.

Usage: python multihost_worker.py OUTDIR NUM_PROCESSES PROCESS_ID PORT [MP] [FSDP]

MP (default 1) sets the 'model' mesh axis: MP=2 runs DPxTP with
megatron-sharded transformer weights — laid out so each TP pair is
process-local (rows of the device grid), the realistic pod layout where
TP rides intra-host ICI. FSDP=1 additionally shards params + optimizer
moments over 'data' (ZeRO-3) with the in-step sharding constraint.
"""
import os
import sys


def main():
    out_dir, num_procs, pid, port = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    mp = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    fsdp = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
    n_local = 8 // num_procs
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local} "
        + os.environ.get("XLA_FLAGS", "")
    )

    import jax

    # this environment's sitecustomize pins jax_platforms="axon,cpu"
    # (a tunneled TPU platform); override after import like tests/conftest.py
    jax.config.update("jax_platforms", "cpu")

    from multimodal_uncertainty_tpu.parallel.multihost import (
        initialize,
        is_primary,
        put_global_batch_fn,
    )

    if num_procs > 1:
        initialize(f"localhost:{port}", num_processes=num_procs, process_id=pid)
    assert jax.device_count() == 8, jax.devices()

    import numpy as np

    from multimodal_uncertainty_tpu.data.fmnist import get_fmnist
    from multimodal_uncertainty_tpu.parallel.mesh import make_mesh
    from multimodal_uncertainty_tpu.parallel.sharding import (
        shard_state,
        state_sharding_tree,
    )
    from multimodal_uncertainty_tpu.training.trainer import Trainer
    from multimodal_uncertainty_tpu.zoo import setup_fashionmnist

    train, _, _ = get_fmnist(
        batch_size=32, synthetic=True, synthetic_n=128, seed=7
    )
    # mp>1: the MIMO transformer, whose CLIP-stack weights the megatron TP
    # rules shard; mp=1: the MIMO ResNet (pure DP)
    setup = setup_fashionmnist(
        model_type="MultiHead", transformer=mp > 1, lr=0.05,
        total_steps=len(train) * 2,
        seed_key=jax.random.key(1), attn_impl="xla",
    )
    mesh = make_mesh(8, model_parallel=mp)
    state = shard_state(setup.state, mesh, tp=mp > 1, fsdp=fsdp)
    state_sh = (
        state_sharding_tree(setup.state, mesh, tp=mp > 1, fsdp=True)
        if fsdp else None
    )

    trainer = Trainer(
        setup.bundle,
        setup.optimizer,
        state,
        rng=jax.random.key(2),
        size_fn=setup.size_fn,
        verbose=False,
        put_batch_fn=put_global_batch_fn(mesh),
        state_shardings=state_sh,
    )
    H = {}

    from multimodal_uncertainty_tpu.training.callbacks import LambdaCallback

    def keep(epoch, logs):
        H.setdefault("loss", []).append(logs["loss"])
        H.setdefault("val_ece", []).append(logs["val_ece"])

    cb = LambdaCallback(on_epoch_end=keep)
    # ece=True drives the keep_preds path: data-sharded eval outputs are
    # allgathered (parallel/multihost.gather_to_host) before the host-side
    # calibration metric — the multi-host metric plumbing under test
    trainer.train_loop(train, valid_generator=train,
                       steps_per_epoch=len(train), validation_steps=len(train),
                       epochs=2, callbacks=[cb], patience=10, ece=True)

    from multimodal_uncertainty_tpu.parallel.multihost import (
        gather_to_host,
    )

    # TP/FSDP-sharded params are not fully addressable on one process;
    # gather for the cross-topology comparison (test-only — real
    # checkpointing of this state goes through orbax). process_allgather
    # is a COLLECTIVE: every process must participate, only the primary
    # writes.
    leaves = [
        np.asarray(jax.device_get(gather_to_host(l)))
        for l in jax.tree_util.tree_leaves(trainer.state.params)
    ]
    if is_primary():
        np.savez(
            os.path.join(
                out_dir,
                f"result_np{num_procs}_mp{mp}{'_fsdp' if fsdp else ''}.npz",
            ),
            losses=np.asarray(H["loss"], np.float64),
            val_ece=np.asarray(H["val_ece"], np.float64),
            **{f"p{i}": l for i, l in enumerate(leaves)},
        )
    print(f"worker {pid}/{num_procs} done", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
