"""Logging / tracing — TPU-native analog of the reference's tracing stack
(reference: src/utils.rs:30-103 + src/main.rs).

Replicates the observable behavior: a custom event format
``[timestamp] [LEVEL] [thread ThreadId(n)] file:line - message``
(utils.rs:45-77), dual sinks (ANSI console + non-ANSI daily-rolling file
under logs/, utils.rs:78-93), env-var level filtering (``STARK_LOG``,
default "info" — the RUST_LOG analog, utils.rs:95).  Unlike the reference
(which drops the writer guard and can lose buffered logs, SURVEY §3.1),
handlers flush on close.

Also exposes :func:`profile_trace` — a context manager around
``jax.profiler.trace`` for kernel timelines (§5.1 TPU equivalent of
cargo-flamegraph).
"""

from __future__ import annotations

import contextlib
import datetime
import logging
import os
import sys
import threading

_LEVELS = {
    "trace": 5,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
}

logging.addLevelName(5, "TRACE")


class _RefFormatter(logging.Formatter):
    """[timestamp] [LEVEL] [thread ThreadId(n)] file:line - message"""

    def __init__(self, ansi: bool):
        super().__init__()
        self.ansi = ansi

    _COLORS = {
        "TRACE": "\x1b[35m", "DEBUG": "\x1b[34m", "INFO": "\x1b[32m",
        "WARNING": "\x1b[33m", "ERROR": "\x1b[31m",
    }

    def format(self, record: logging.LogRecord) -> str:
        ts = datetime.datetime.fromtimestamp(record.created).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )[:-3]
        level = record.levelname
        if self.ansi and level in self._COLORS:
            level_s = f"{self._COLORS[level]}{level}\x1b[0m"
        else:
            level_s = level
        tid = threading.get_ident() % 100000
        return (
            f"[{ts}] [{level_s}] [thread ThreadId({tid})] "
            f"{record.filename}:{record.lineno} - {record.getMessage()}"
        )


_configured = False


def setup_logging(log_dir: str = "logs", level: str | None = None) -> logging.Logger:
    """Configure the ``stark_tpu`` logger: console + daily file sink."""
    global _configured
    logger = logging.getLogger("stark_tpu")
    if _configured:
        return logger
    _configured = True
    lvl = _LEVELS.get((level or os.environ.get("STARK_LOG", "info")).lower(),
                      logging.INFO)
    logger.setLevel(lvl)

    console = logging.StreamHandler(sys.stderr)
    console.setFormatter(_RefFormatter(ansi=sys.stderr.isatty()))
    logger.addHandler(console)

    try:
        os.makedirs(log_dir, exist_ok=True)
        day = datetime.date.today().isoformat()
        fh = logging.FileHandler(os.path.join(log_dir, f"output.log.{day}"))
        fh.setFormatter(_RefFormatter(ansi=False))
        logger.addHandler(fh)
    except OSError:
        pass
    return logger


def get_logger() -> logging.Logger:
    return logging.getLogger("stark_tpu")


@contextlib.contextmanager
def profile_trace(log_dir: str = "logs/jax-trace"):
    """jax.profiler trace scope (view with TensorBoard/perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
