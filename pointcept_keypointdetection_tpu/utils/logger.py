"""Root logger with per-process file handler and colored console.

Parity surface: `pointcept/utils/logger.py` (`get_root_logger`).  Only process
index 0 logs to console by default; every process can log to its own file.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGER_NAME = "pkt"
_initialized = False


class _ColorFormatter(logging.Formatter):
    COLORS = {
        logging.WARNING: "\x1b[33m",
        logging.ERROR: "\x1b[31m",
        logging.CRITICAL: "\x1b[31;1m",
    }
    RESET = "\x1b[0m"

    def format(self, record):
        msg = super().format(record)
        color = self.COLORS.get(record.levelno)
        if color and sys.stderr.isatty():
            return f"{color}{msg}{self.RESET}"
        return msg


def get_root_logger(
    log_file: Optional[str] = None,
    log_level: int = logging.INFO,
    file_mode: str = "a",
    process_index: Optional[int] = None,
) -> logging.Logger:
    """Create (once) and return the framework root logger."""
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if _initialized:
        return logger
    logger.setLevel(log_level)
    logger.propagate = False

    if process_index is None:
        try:
            import jax

            process_index = jax.process_index()
        except Exception:
            process_index = 0

    fmt = "[%(asctime)s %(levelname)s %(filename)s:%(lineno)d] %(message)s"
    if process_index == 0:
        console = logging.StreamHandler(sys.stdout)
        console.setFormatter(_ColorFormatter(fmt))
        console.setLevel(log_level)
        logger.addHandler(console)

    if log_file is not None:
        if process_index != 0:
            root, ext = os.path.splitext(log_file)
            log_file = f"{root}.proc{process_index}{ext}"
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file, file_mode)
        fh.setFormatter(logging.Formatter(fmt))
        fh.setLevel(log_level)
        logger.addHandler(fh)

    if not logger.handlers:
        logger.addHandler(logging.NullHandler())
    _initialized = True
    return logger
