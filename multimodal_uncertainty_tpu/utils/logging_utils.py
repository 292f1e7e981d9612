"""Operational output capture: mirror the training CLIs' console into
``save_path/out.log``.

The reference ran every job under a stdout/stderr tee so the console
transcript survived next to the checkpoints (``src/utils.py`` redirection,
driven by its training scripts). This is that capability re-derived for
this codebase's realities:

* one ``install()``-style object (the :class:`~multimodal_uncertainty_tpu.
  training.preemption.PreemptionGuard` idiom) instead of a decorator — the
  CLIs install it right after ``save_path`` exists and never look back;
* ONE combined log file — interleaving stdout/stderr in wall order is what
  an operator reading a failed run wants, and it is what the console showed;
* carriage-return awareness: the progress renderer repaints lines with
  ``\\r`` dozens of times per step. The console keeps that live behavior;
  the FILE copy keeps only each line's final state, so ``out.log`` stays a
  readable transcript instead of megabytes of repaints.

Library logging is unaffected (the package root installs a NullHandler —
``multimodal_uncertainty_tpu/__init__.py``); this module only mirrors the
process's console streams.
"""
from __future__ import annotations

import sys
from typing import Optional, TextIO


class _MirrorStream:
    """File-like wrapper: writes pass through to the live console stream
    and are also fed to the shared TeeLog sink."""

    def __init__(self, primary: TextIO, sink: "TeeLog"):
        self._primary = primary
        self._sink = sink

    def write(self, data: str) -> int:
        n = self._primary.write(data)
        self._sink._absorb(data)
        return n

    def flush(self) -> None:
        self._primary.flush()
        self._sink._flush_file()

    def isatty(self) -> bool:
        # progress rendering keys its live repaints off the CONSOLE
        return self._primary.isatty()

    @property
    def encoding(self):
        return getattr(self._primary, "encoding", "utf-8")


class TeeLog:
    """Mirror ``sys.stdout``/``sys.stderr`` into one append-mode log file.

    ``install()`` swaps both streams for mirrors and returns self;
    ``uninstall()`` restores them and closes the file (tests; the CLIs just
    let the process exit). Repainted progress lines (``\\r``) reach the file
    only in their final state.
    """

    def __init__(self, path: str):
        self.path = path
        self._file: Optional[TextIO] = None
        self._pending = ""
        self._saved = None

    # -- file-side line discipline ------------------------------------
    def _absorb(self, data: str) -> None:
        if self._file is None:
            return
        for ch in data:
            if ch == "\r":
                self._pending = ""  # line is being repainted: drop the draft
            elif ch == "\n":
                self._file.write(self._pending + "\n")
                self._pending = ""
            else:
                self._pending += ch

    def _flush_file(self) -> None:
        if self._file is not None:
            self._file.flush()

    # -- stream management ---------------------------------------------
    def install(self) -> "TeeLog":
        if self._saved is not None:
            return self  # already installed
        self._file = open(self.path, "a", buffering=1)
        self._saved = (sys.stdout, sys.stderr)
        sys.stdout = _MirrorStream(self._saved[0], self)
        sys.stderr = _MirrorStream(self._saved[1], self)
        return self

    def uninstall(self) -> None:
        if self._saved is None:
            return
        sys.stdout, sys.stderr = self._saved
        self._saved = None
        if self._pending:
            self._file.write(self._pending + "\n")
            self._pending = ""
        self._file.close()
        self._file = None

    def __enter__(self) -> "TeeLog":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()
