"""Preemption-safe training: SIGTERM-graceful mid-epoch checkpointing.

TPU pods (and most batch schedulers) announce preemption by delivering
SIGTERM with a short grace window. The reference has no equivalent — its
recovery points are epoch-end weight saves only (``src/training_loop.py:40-45``),
so a preempted run loses the partial epoch AND, because torch DataLoader
shuffles from a global generator, resumes with a different data order.

Here preemption is first-class:

* :class:`PreemptionGuard` latches the signal (handler just sets an Event —
  async-signal-safe) and the :class:`~training.trainer.Trainer` polls it at
  batch boundaries;
* on the first boundary after the signal, the trainer writes a mid-epoch
  checkpoint (``model_midtrain.pt``): full train state + the epoch's
  running loss/metric/size sums + the next batch index;
* resume re-derives the interrupted epoch's data permutation (loaders'
  stateless ``iter_epoch``, ``data/loaders.py``) and continues from that
  batch — the resumed run's final parameters and history.csv are
  bit-identical to an uninterrupted run (tests/test_preemption.py).

The guard is also how ``--checkpoint_every_steps`` periodic mid-epoch
saves stay crash-consistent: both paths write the same artifact.
"""
from __future__ import annotations

import logging
import signal
import threading
from typing import Iterable

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Latches termination signals so training can stop at a safe boundary.

    The handler only sets a :class:`threading.Event` (async-signal-safe and
    cheap); all checkpointing happens later on the training thread. Install
    from the main thread (CPython restricts ``signal.signal`` to it);
    ``request()`` triggers programmatically — used by tests and by any
    embedding application that learns of preemption out-of-band.
    """

    def __init__(self) -> None:
        self._event = threading.Event()
        self._prev: dict = {}

    def install(self, signals: Iterable[int] = (signal.SIGTERM,)) -> "PreemptionGuard":
        for sig in signals:
            self._prev[sig] = signal.signal(sig, self._handler)
        return self

    def uninstall(self) -> None:
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()

    def _handler(self, signum, frame) -> None:
        # no logging/IO here: handlers run between arbitrary bytecodes
        self._event.set()

    def request(self) -> None:
        """Trigger as if the signal had arrived."""
        self._event.set()

    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def clear(self) -> None:
        self._event.clear()
