"""Tracing / profiling (SURVEY.md §5.1).

The reference's observability is a TensorBoard callback plus a 1 Hz
nvidia-smi poller (models/CvT(Par).py:472, tools/memory.py).  TPU-native
equivalents:

- ``trace``: context manager around jax.profiler.trace — captures a
  Perfetto/XProf trace of everything inside (view with xprof / tensorboard).
- ``StepTimer``: per-step wall times -> images/sec with warmup skipping and
  percentile summary; used by bench.py-style harnesses and the train loop's
  verbose output.
- ``annotate``: named TraceAnnotation for marking phases inside a step.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "profile"):
    """Capture a device trace: `with trace('profile'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a traced step."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step stats with device sync on read."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, items_per_step: Optional[int] = None) -> Dict:
        import numpy as np

        ts = np.array(self.times[self.warmup:] or self.times)
        out = {
            "steps": len(ts),
            "mean_s": float(ts.mean()),
            "p50_s": float(np.percentile(ts, 50)),
            "p95_s": float(np.percentile(ts, 95)),
        }
        if items_per_step:
            out["items_per_sec"] = items_per_step / out["mean_s"]
        return out


def device_memory_summary() -> str:
    """One-line HBM summary (see tools/monitor.py for the live loop)."""
    from .monitor import tpu_memory_stats

    stats = tpu_memory_stats()
    if not stats:
        return "no device memory stats available"
    return "; ".join(
        f"{d['device']}: {d['bytes_in_use_gb']:.2f}/{d['bytes_limit_gb']:.2f}"
        f" GB (peak {d['peak_bytes_gb']:.2f})" for d in stats)
