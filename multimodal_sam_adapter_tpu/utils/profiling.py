"""Profiling / tracing subsystem.

The reference ships only commented-out torch.profiler scaffolding and a
FLOPs counter (SURVEY.md section 5 'Tracing / profiling'). Here:
- `trace(dir)`: context manager around jax.profiler (TensorBoard-viewable
  device traces)
- `StepTimer`: per-step wall-clock EMA with amortized sync handling
- `annotate(name)`: TraceAnnotation for custom spans inside host code
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """EMA step timer; call .tick() once per train step."""

    def __init__(self, alpha: float = 0.05):
        self.alpha = alpha
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else (
                self.alpha * dt + (1 - self.alpha) * self.ema
            )
        self._last = now
        return self.ema
