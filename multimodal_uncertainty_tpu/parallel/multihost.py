"""Multi-host (multi-process) SPMD execution.

The reference is single-process/single-GPU (SURVEY.md §2.8); one v5e-8 host
is too. Past one host (v5e-16+, multi-slice), JAX runs one Python process
per host, each seeing only its local chips — the mesh spans them all and
every process dispatches the SAME jitted program (SPMD). This module holds
the few host-boundary pieces that pattern needs:

* :func:`initialize` — `jax.distributed.initialize` wrapper (on real TPU
  pods the coordinator/process-id arguments come from the environment and
  may all be omitted; on CPU test fleets they are passed explicitly).
* :func:`put_global_batch_fn` — builds the per-step global batch from
  process-local numpy via ``jax.make_array_from_process_local_data``. Every
  process feeds its own contiguous row-block of the batch; a batch whose
  leading dim doesn't divide the data axis is replicated instead (same
  exactness-over-speed rule as the single-host ``put_batch_fn``).
* :func:`gather_to_host` — replicates a data-sharded array so host-side
  metric code (AUROC/ECE, prediction dumps) can ``device_get`` it on every
  process.
* :func:`is_primary` — gate for side effects (checkpoints, history.csv,
  progress rendering) that must run on exactly one host.

Data layout contract: all processes construct loaders with the SAME seed,
so the stateless per-(seed, epoch) permutation (data/loaders.py) is
identical everywhere; each process then keeps rows
``[pid*B/P, (pid+1)*B/P)`` of every batch. Each host therefore collates the
full batch and keeps 1/P of it — duplicated host work that is free for
mmap-packed shards and acceptable for jsonl pipelines; decode-heavy
production jobs should instead shard the dataset files per host and pass
``already_local=True``.

CPU-validated end-to-end in tests/test_multihost.py: two OS processes x 4
CPU devices form one 8-device mesh and train; final params match the
single-process 8-device run bit-for-bit.
"""
from __future__ import annotations

import logging
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the distributed runtime.

    ``num_processes`` semantics (matching ``train.py --num_processes``):

    * ``None`` / ``1`` with no coordinator — single-process run, no-op.
    * ``0`` — AUTO-DISCOVER: on TPU pods the coordinator, process count and
      process id all come from the TPU environment, so
      ``jax.distributed.initialize()`` is called with no arguments at all
      (passing explicit ``None``s alongside a count would skip discovery).
    * anything else — explicit topology (CPU test fleets): all three
      arguments are forwarded as given.
    """
    if num_processes == 0:
        jax.distributed.initialize()
    elif coordinator_address is None and (num_processes or 1) == 1:
        return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_primary() -> bool:
    return jax.process_index() == 0


def put_global_batch_fn(mesh: Mesh, *, already_local: bool = False):
    """Trainer ``put_batch_fn`` for a mesh spanning multiple processes.

    Each leaf of the (numpy) batch becomes one GLOBAL jax.Array sharded
    P('data') over the whole mesh. With ``already_local=False`` (default)
    every process holds the full batch and this function slices out its
    contiguous row-block; with ``already_local=True`` the loader already
    yields only this process's rows (per-host dataset shards) and the
    global leading dim is ``local * process_count``.
    """
    n_data = mesh.shape["data"]
    sh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    pid, pcount = jax.process_index(), jax.process_count()

    def put_leaf_sharded(a):
        a = np.asarray(a)
        if already_local:
            local = a
        else:
            rows = a.shape[0] // pcount
            local = a[pid * rows : (pid + 1) * rows]
        return jax.make_array_from_process_local_data(sh, local)

    def put_leaf_replicated(a):
        return jax.make_array_from_process_local_data(rep, np.asarray(a))

    def put(batch):
        leaves = jax.tree_util.tree_leaves(batch)
        global_rows = {
            np.shape(a)[0] * (pcount if already_local else 1) for a in leaves
        }
        divisible = all(r % n_data == 0 and r > 0 for r in global_rows)
        if not divisible and already_local:
            raise ValueError(
                "per-host dataset shards must produce batches divisible by "
                f"the data axis ({sorted(global_rows)} rows vs data={n_data})"
            )
        fn = put_leaf_sharded if divisible else put_leaf_replicated
        return jax.tree_util.tree_map(fn, batch)

    return put


def gather_to_host(x):
    """Make an array ``device_get``-able on every process — used for
    epoch-granular host metrics (AUROC/ECE) and prediction dumps; never on
    the step path. Fully-replicated / fully-addressable arrays pass
    through; data-sharded ones are allgathered (tiled) across processes."""
    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        return x
    if getattr(x, "is_fully_replicated", False):
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(x, tiled=True)
