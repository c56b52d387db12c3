"""Tracing / profiling + numerical-debug hooks (SURVEY §5).

TPU-native replacements for the reference's minimal observability:
- CUDA-event per-iteration timing (train.py:118-119) -> `StepTimer` with
  `block_until_ready` walls and EMA.
- `torch.autograd.set_detect_anomaly` (train.py:615) -> `enable_nan_debug()`
  (jax_debug_nans) and `checked()` (jax.experimental.checkify wrapper).
- No profiler in the reference -> `trace()` context manager emitting
  jax.profiler traces viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debug(enable: bool = True) -> None:
    """Raise at the first NaN-producing op (detect_anomaly equivalent)."""
    jax.config.update("jax_debug_nans", enable)


def checked(fn, errors=None):
    """Wrap a jittable fn with checkify NaN/div checks; returns a function
    whose output is (error, value) — call error.throw() to surface."""
    from jax.experimental import checkify
    errors = errors or checkify.float_checks
    return checkify.checkify(fn, errors=errors)


class StepTimer:
    """Per-step wall timing with EMA (replaces CUDA-event elapsed_time)."""

    def __init__(self, ema: float = 0.9):
        self._ema_coef = ema
        self.ema_ms: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        ms = (time.perf_counter() - self._t0) * 1000.0
        self.ema_ms = (ms if self.ema_ms is None
                       else self._ema_coef * self.ema_ms
                       + (1 - self._ema_coef) * ms)
        return ms
