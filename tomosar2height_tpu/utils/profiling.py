"""Profiling helpers: jax.profiler traces + phase timers.

The reference's only observability is wall-clock logs (generator.py:130,159;
train.py:156-165). Here: a context manager that captures a TensorBoard-viewable
device trace when supported, and a lightweight phase timer whose results land
in the metric logger.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None or the
    backend doesn't support tracing, e.g. some remote relays)."""
    if not log_dir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
    except Exception as e:  # relay backends may not support profiling
        log.warning("jax profiler unavailable: %s", e)
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception:
            pass


class PhaseTimer:
    """Accumulates wall-clock per named phase; ``summary()`` feeds wandb/logs."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        out = {}
        for k, v in self.totals.items():
            out[f"time/{k}_total_s"] = v
            out[f"time/{k}_mean_ms"] = 1000.0 * v / max(self.counts[k], 1)
        return out

    def reset(self):
        self.totals.clear()
        self.counts.clear()
