"""Tracing / profiling subsystem.

The reference has no profiler — only wall-clock batch timing with ETA prints
(reference src/train_vae.py:114-125; SURVEY.md §5.1). Here:

- :class:`StepTimer`: streaming per-step latency stats (mean/p50/p95,
  images/sec) the trainer can fold into its ETA lines;
- :func:`trace`: context manager around ``jax.profiler`` writing an XPlane
  trace viewable in TensorBoard/XProf/Perfetto — enable with
  ``cfg['profile_dir']``.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    def __init__(self, capacity: int = 2048):
        self.times: list[float] = []
        self.capacity = capacity
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, n_items: int = 1):
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        if len(self.times) < self.capacity:
            self.times.append(dt / max(n_items, 1))

    def stats(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "items_per_s": float(1.0 / arr.mean()),
        }


@contextlib.contextmanager
def trace(profile_dir: str | None):
    """Capture a device trace for the enclosed region if profile_dir is set."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
