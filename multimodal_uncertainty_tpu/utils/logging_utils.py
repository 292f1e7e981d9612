"""Logging utilities (reference ``src/utils.py:23-73,122-165``)."""
from __future__ import annotations

import logging
import logging.handlers
import sys
from contextlib import contextmanager

logger = logging.getLogger(__name__)


class Fork:
    """Tee writes to two file objects."""

    def __init__(self, file1, file2):
        self.file1 = file1
        self.file2 = file2

    def write(self, data):
        self.file1.write(data)
        self.file2.write(data)

    def flush(self):
        self.file1.flush()
        self.file2.flush()


@contextmanager
def _replace_standard_stream(stream_name, file_):
    stream = getattr(sys, stream_name)
    setattr(sys, stream_name, file_)
    try:
        yield
    finally:
        setattr(sys, stream_name, stream)


def run_with_redirection(stdout_path, stderr_path, func):
    """Run func while teeing stdout/stderr to files."""

    def func_wrapper(*args, **kwargs):
        with open(stdout_path, "a", 1) as out_dst, open(stderr_path, "a", 1) as err_dst:
            out_fork = Fork(sys.stdout, out_dst)
            err_fork = Fork(sys.stderr, err_dst)
            with _replace_standard_stream("stderr", err_fork):
                with _replace_standard_stream("stdout", out_fork):
                    return func(*args, **kwargs)

    return func_wrapper


def configure_logger(
    name="",
    console_logging_level=logging.INFO,
    file_logging_level=None,
    log_file=None,
):
    """Console and/or rotating-file logger configuration."""
    if len(logging.getLogger(name).handlers) != 0:
        return logging.getLogger(name)
    if console_logging_level is None and file_logging_level is None:
        return None

    lg = logging.getLogger(name)
    lg.handlers = []
    lg.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")

    if console_logging_level is not None:
        ch = logging.StreamHandler(sys.stdout)
        ch.setFormatter(fmt)
        ch.setLevel(console_logging_level)
        lg.addHandler(ch)

    if file_logging_level is not None:
        if log_file is None:
            raise ValueError("If file logging enabled, log_file path is required")
        fh = logging.handlers.RotatingFileHandler(
            log_file, maxBytes=1048576 * 5, backupCount=7
        )
        fh.setFormatter(fmt)
        lg.addHandler(fh)

    lg.info("Logging configured!")
    return lg
