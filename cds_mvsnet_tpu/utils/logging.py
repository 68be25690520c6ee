"""Logging setup: console + rotating file handler.

Behavioral reference: logger/logger.py + logger/logger_config.json in
TruongKhang/cds-mvsnet (dictConfig with console DEBUG + rotating 10MB x 20
info.log), without the JSON indirection.
"""

from __future__ import annotations

import logging
import logging.handlers
from pathlib import Path

__all__ = ["setup_logging", "get_logger"]

_LEVELS = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}


def setup_logging(save_dir=None, verbosity: int = 2) -> logging.Logger:
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")

    console = logging.StreamHandler()
    console.setLevel(_LEVELS.get(verbosity, logging.DEBUG))
    console.setFormatter(logging.Formatter("%(message)s"))
    root.addHandler(console)

    if save_dir is not None:
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.handlers.RotatingFileHandler(
            Path(save_dir) / "info.log", maxBytes=10 * 1024 * 1024, backupCount=20
        )
        fh.setLevel(logging.INFO)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    return root


def get_logger(name: str, verbosity: int = 2) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(_LEVELS.get(verbosity, logging.DEBUG))
    return logger
