"""Profiling / step-timing hooks.

The reference has no tracing at all (SURVEY.md §5) — only Dassl's wall-clock
batch prints.  Here: an EMA step timer feeding the metrics stream, plus an
optional ``jax.profiler`` trace window (XProf-compatible) controlled by
``TRAIN.PROFILE_DIR``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Tracks per-step wall time + images/sec with warmup-aware EMA."""

    def __init__(self, ema: float = 0.9):
        self._ema = ema
        self._avg: Optional[float] = None
        self._last = None
        self._t0 = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self._last = dt
        self._count += 1
        # the FIRST step includes jit compilation (minutes on the remote-
        # compile TPU) — never let it into the average; seed from step 2
        if self._count == 1:
            return dt
        if self._avg is None:
            self._avg = dt
        else:
            self._avg = self._ema * self._avg + (1 - self._ema) * dt
        return dt

    @property
    def avg(self) -> float:
        # before a post-compile sample exists, the last (compile) time is
        # the only honest number available
        if self._avg is not None:
            return self._avg
        return self._last or 0.0

    def throughput(self, items: int) -> float:
        a = self.avg
        return items / a if a else 0.0


@contextlib.contextmanager
def profile_trace(logdir: Optional[str]):
    """Trace into an XProf logdir when enabled, else no-op."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
