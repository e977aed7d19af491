"""Rank-aware logging.

Functional parity: reference vtdm/logger.py:30-83 — colored console handler
on process 0 only, plus a per-run `log.txt` file handler; `lru_cache`d so
repeated setup calls return the same logger.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
from typing import Optional

_COLORS = {
    logging.DEBUG: "\x1b[38;5;245m",
    logging.INFO: "\x1b[32m",
    logging.WARNING: "\x1b[33m",
    logging.ERROR: "\x1b[31m",
    logging.CRITICAL: "\x1b[41m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if color and sys.stdout.isatty() else msg


@functools.lru_cache()
def setup_logger(
    name: str = "hi3d_tpu",
    output: Optional[str] = None,
    distributed_rank: Optional[int] = None,
) -> logging.Logger:
    """Console (rank 0) + `<output>/log.txt` (all ranks) logger."""
    if distributed_rank is None:
        try:
            import jax

            distributed_rank = jax.process_index()
        except Exception:
            distributed_rank = 0

    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    fmt = "[%(asctime)s %(name)s %(levelname)s] %(message)s"

    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(_ColorFormatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(ch)

    if output:
        filename = output if output.endswith(".txt") else os.path.join(
            output, "log.txt"
        )
        if distributed_rank > 0:
            filename = f"{filename}.rank{distributed_rank}"
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(logging.Formatter(fmt, datefmt="%m/%d %H:%M:%S"))
        logger.addHandler(fh)
    return logger
