"""Host-side batch loaders feeding device-resident training.

Replaces torch DataLoader. Two flavors:

* :class:`ArrayLoader` — whole-dataset-in-memory arrays (FashionMNIST,
  precomputed embeddings); pure numpy slicing, zero per-item Python cost.
* :class:`MapLoader` — map-style datasets with a collate function and an
  optional thread pool + background prefetch (jsonl/image pipelines).

Both reshuffle per epoch from a seeded RNG and expose ``len()`` = number of
batches (ceil), matching torch DataLoader(drop_last=False) semantics used
throughout the reference.

Epoch permutations are STATELESS functions of ``(seed, epoch)``
(:func:`_epoch_perm`): iterating epoch e always sees the same shuffle, no
matter how many prior iterations ran in this process. That is what makes
mid-epoch preemption resume exact (``training/preemption.py``) — a resumed
run re-derives epoch e's permutation and skips the already-consumed batches
via ``iter_epoch(e, start_batch)`` — and it also means a ``--resume`` run
replays the same data order the uninterrupted run would have seen (the
reference's torch DataLoader draws from a global generator, so its resumed
runs silently change data order).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Optional, Sequence

import numpy as np


def _epoch_perm(seed: int, epoch: int, n: int, shuffle: bool) -> np.ndarray:
    """Index order for one epoch, derived statelessly from (seed, epoch)."""
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng([seed, epoch]).shuffle(idx)
    return idx


class ArrayLoader:
    def __init__(
        self,
        arrays: Sequence[np.ndarray],
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        sample_size: Optional[int] = None,
    ):
        n = len(arrays[0])
        for a in arrays[1:]:
            assert len(a) == n
        if sample_size is not None:
            arrays = [a[:sample_size] for a in arrays]
            n = len(arrays[0])
        self.arrays = [np.asarray(a) for a in arrays]
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._auto_epoch = 0

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        epoch, self._auto_epoch = self._auto_epoch, self._auto_epoch + 1
        return self.iter_epoch(epoch)

    def iter_epoch(self, epoch: int, start_batch: int = 0):
        """Iterate epoch ``epoch`` deterministically, skipping the first
        ``start_batch`` batches without materializing them."""
        idx = _epoch_perm(self.seed, epoch, self.n, self.shuffle)
        for start in range(start_batch * self.batch_size, self.n, self.batch_size):
            sel = idx[start : start + self.batch_size]
            batch = tuple(a[sel] for a in self.arrays)
            yield batch if len(batch) > 2 else (batch[0], batch[1])


class MapLoader:
    """Map-style dataset -> collated numpy batches, with threaded fetch and a
    one-batch-deep background prefetch pipeline."""

    def __init__(
        self,
        dataset: Any,  # supports __len__/__getitem__
        batch_size: int,
        collate_fn: Callable,
        *,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 0,
        sample_size: Optional[int] = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.n = len(dataset) if sample_size is None else min(sample_size, len(dataset))
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self._auto_epoch = 0
        self._pool = (
            ThreadPoolExecutor(max_workers=num_workers) if num_workers > 0 else None
        )

    def __len__(self):
        return (self.n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, sel):
        if self._pool is not None:
            items = list(self._pool.map(self.dataset.__getitem__, sel))
        else:
            items = [self.dataset[i] for i in sel]
        return self.collate_fn(items)

    def __iter__(self):
        epoch, self._auto_epoch = self._auto_epoch, self._auto_epoch + 1
        return self.iter_epoch(epoch)

    def iter_epoch(self, epoch: int, start_batch: int = 0):
        """Iterate epoch ``epoch`` deterministically, skipping the first
        ``start_batch`` batches without fetching/collating their items."""
        idx = _epoch_perm(self.seed, epoch, self.n, self.shuffle)
        batches = [
            idx[s : s + self.batch_size] for s in range(0, self.n, self.batch_size)
        ][start_batch:]
        if self.prefetch <= 0:
            for sel in batches:
                yield self._make_batch(sel)
            return
        yield from _produce_in_thread(
            (lambda sel=sel: self._make_batch(sel) for sel in batches),
            self.prefetch,
        )


def _produce_in_thread(thunks, maxsize: int):
    """Run `thunks` (an iterable of zero-arg callables) on a background
    thread, yielding their results through a bounded queue. Exceptions
    propagate to the consumer; early consumer exit cancels and reaps the
    producer instead of leaking it."""
    q: queue.Queue = queue.Queue(maxsize=maxsize)
    stop = object()
    cancel = threading.Event()

    def _put(item) -> bool:
        """Put unless the consumer cancelled; returns False on cancel."""
        while True:
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                if cancel.is_set():
                    return False

    def producer():
        try:
            for thunk in thunks:
                if cancel.is_set():
                    return
                if not _put(thunk()):
                    return
            _put(stop)
        except BaseException as e:  # propagate to the consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            yield item
    finally:
        # Consumer may stop early (e.g. eval with steps < len(loader));
        # unblock and reap the producer instead of leaking it.
        cancel.set()
        while not q.empty():
            try:
                q.get_nowait()
            except queue.Empty:  # pragma: no cover
                break
        t.join()


class DevicePrefetcher:
    """Overlap host->device transfer with device compute.

    Wraps any batch iterable; a background thread applies ``put_fn``
    (default: ``jnp.asarray`` over the batch pytree, i.e. device_put) to
    upcoming batches while the consumer's current step is still executing,
    keeping up to ``depth`` device-resident batches in flight. On hosts
    where the PCIe/tunnel transfer is a visible fraction of step time this
    converts transfer from serial cost to overlapped background work — the
    TPU-native replacement for torch DataLoader's pin_memory +
    non_blocking copies.

    JAX note: device_put from a secondary thread is safe and itself
    asynchronous; the queue depth bounds device memory at
    ``depth * batch_bytes`` extra."""

    def __init__(self, loader, put_fn=None, depth: int = 2):
        self.loader = loader
        self.put_fn = put_fn
        self.depth = depth

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        return self.iter_over(self.loader)

    def iter_over(self, batches):
        """Prefetch over an explicit batch iterable (e.g. a loader's
        ``iter_epoch``) instead of ``iter(self.loader)``."""
        put = self.put_fn
        if put is None:
            import jax

            import jax.numpy as jnp

            def put(batch):  # noqa: E731 - default device placement
                return jax.tree_util.tree_map(jnp.asarray, batch)

        yield from _produce_in_thread(
            (lambda b=b: put(b) for b in batches), self.depth
        )


def subset_then_loaders(
    training, dev, testing, collate_fn, args
) -> tuple:
    """Reference ``get_dataset`` (``src/dataset.py:287-321``): truncate the
    train set to sample_size, build train(shuffle)/dev/test loaders."""
    train_loader = MapLoader(
        training,
        args.batch_size,
        collate_fn,
        shuffle=True,
        seed=args.seed,
        num_workers=getattr(args, "n_workers", 0),
        sample_size=args.sample_size,
    )
    dev_loader = MapLoader(
        dev, args.batch_size, collate_fn, num_workers=getattr(args, "n_workers", 0)
    )
    test_loader = MapLoader(
        testing, args.batch_size, collate_fn, num_workers=getattr(args, "n_workers", 0)
    )
    return train_loader, dev_loader, test_loader
