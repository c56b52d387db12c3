"""Logging: timestamped stdout + rotating file sink.

Replaces the reference's loguru + `safe_state` stdout wrapper
(train.py:35,604-606; utils/general_utils.py:118-139) with stdlib logging.
"""
from __future__ import annotations

import logging
import logging.handlers
import os
import random
import sys
from typing import Optional

import numpy as np

_LOGGER: Optional[logging.Logger] = None


def get_logger(name: str = "langsplat4d") -> logging.Logger:
    global _LOGGER
    if _LOGGER is not None:
        return _LOGGER
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s", "%d/%m %H:%M:%S"))
        logger.addHandler(h)
    _LOGGER = logger
    return logger


def add_file_sink(log_dir: str, filename: str,
                  max_bytes: int = 500 * 1024 * 1024) -> None:
    """500MB-rotated file sink (train.py:606)."""
    os.makedirs(log_dir, exist_ok=True)
    h = logging.handlers.RotatingFileHandler(
        os.path.join(log_dir, filename), maxBytes=max_bytes, backupCount=3)
    h.setFormatter(logging.Formatter(
        "%(asctime)s | %(levelname)s | %(message)s"))
    get_logger().addHandler(h)


def safe_state(seed: int = 0) -> None:
    """Seed host RNGs (utils/general_utils.py:136-139)."""
    random.seed(seed)
    np.random.seed(seed)
