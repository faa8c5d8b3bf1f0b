"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock prints
(``stage1_compose/train.py:25,85``, ``inference_utils.py:133``).  This module
adds first-class observability:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace;
* :class:`Throughput` — tokens/sec (and tokens/sec/chip) counters for train
  and decode loops;
* :func:`step_timer` — lightweight per-step wall-clock aggregation with
  percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/tb'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Sliding tokens/sec counter."""

    def __init__(self, n_chips: Optional[int] = None):
        self.n_chips = n_chips or jax.device_count()
        self.reset()

    def reset(self):
        self._tokens = 0
        self._t0 = time.perf_counter()

    def add(self, n_tokens: int):
        self._tokens += int(n_tokens)

    @property
    def tokens_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._tokens / dt if dt > 0 else 0.0

    @property
    def tokens_per_sec_per_chip(self) -> float:
        return self.tokens_per_sec / max(self.n_chips, 1)

    def report(self) -> Dict[str, float]:
        tps = self.tokens_per_sec            # snapshot once: dt keeps moving
        return {
            'tokens': self._tokens,
            'tokens_per_sec': tps,
            'tokens_per_sec_per_chip': tps / max(self.n_chips, 1),
        }


class step_timer:
    """Collect per-step wall times; summarize with percentiles."""

    def __init__(self):
        self.times: List[float] = []
        self._t = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            'n': len(a),
            'mean_s': float(a.mean()),
            'p50_s': float(np.percentile(a, 50)),
            'p95_s': float(np.percentile(a, 95)),
            'max_s': float(a.max()),
        }
