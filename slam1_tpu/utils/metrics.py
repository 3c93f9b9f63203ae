"""Structured per-frame metrics + stage timing.

Replaces the reference's print()-based tracing (SURVEY.md §5
"Metrics / logging": main.py:73,101,143-146 etc.) with a JSONL metrics
stream and wall-clock stage timers, plus optional jax.profiler capture.
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from collections import defaultdict
from typing import Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, every: int = 1,
                 stream=None):
        self.path = path
        self.every = max(every, 1)
        self._fh = open(path, "a") if path else None
        self.stream = stream
        self._n = 0

    def log(self, **fields):
        self._n += 1
        if self._n % self.every:
            return
        rec = {"t": time.time(), **fields}
        line = json.dumps(rec, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self.stream:
            print(line, file=self.stream)

    def close(self):
        if self._fh:
            self._fh.close()


class StageTimers:
    """Accumulating wall-clock timers, ns resolution, context-manager API:

        with timers.stage("frontend"): ...
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """jax.profiler capture when a logdir is given; no-op otherwise."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
