"""Experiment logger.

Behavioral port of reference src/logger.py: batch-size-weighted running means
per tag/metric, per-epoch history snapshots (``safe(False)``), formatted info
lines. Scalar emission is pluggable via ``backend``:

- ``"jsonl"`` (default): append-only JSONL scalar log next to the run
  directory (dependency-light, trivially greppable);
- ``"tensorboard"``: TensorBoard event files exactly like the reference
  (``add_scalar`` per metric + ``add_text`` info lines, reference
  src/logger.py:52-79), so existing TB dashboards work unchanged;
- ``"both"``: both sinks.

The history rides inside checkpoints exactly like the reference's pickled
Logger, which is how learning curves are recovered
(reference make_learning_curve.py:40-48).
"""

from __future__ import annotations

import json
import os
import time
import warnings
from collections import defaultdict
from numbers import Number


class Logger:
    def __init__(self, log_path: str | None = None, backend: str = "jsonl"):
        if backend not in ("jsonl", "tensorboard", "both"):
            raise ValueError(f"unknown logger backend: {backend!r}")
        self.log_path = log_path
        self.backend = backend
        self.tracker = {}
        self.counter = defaultdict(int)
        self.mean = defaultdict(float)
        self.history = defaultdict(list)
        self.iterator = defaultdict(int)
        self._fh = None
        self._tb = None

    def _open_tb(self):
        try:
            from torch.utils.tensorboard import SummaryWriter
        except Exception as e:  # missing/broken tensorboard: degrade, don't die
            warnings.warn(f"tensorboard backend unavailable ({e}); "
                          "falling back to jsonl")
            self.backend = "jsonl"
            return None
        return SummaryWriter(self.log_path)

    def safe(self, write: bool):
        if write:
            if self.log_path:
                # backend may have been reassigned on an unpickled logger
                # (resume): honor the current value each time. The TB writer
                # is reused across epochs — one event file per run, not one
                # per safe() cycle (each SummaryWriter opens a fresh
                # timestamped tfevents file and its own writer thread)
                if self.backend in ("tensorboard", "both") and self._tb is None:
                    self._tb = self._open_tb()
                if self.backend in ("jsonl", "both"):
                    os.makedirs(self.log_path, exist_ok=True)
                    self._fh = open(
                        os.path.join(self.log_path, "scalars.jsonl"), "a")
        else:
            if self._fh is not None:
                self._fh.close()
                self._fh = None
            if self._tb is not None:
                self._tb.flush()
            for name in self.mean:
                self.history[name].append(self.mean[name])

    def close(self):
        """Release the sinks (end of run; safe() can re-open them)."""
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def reset(self):
        self.tracker = {}
        self.counter = defaultdict(int)
        self.mean = defaultdict(float)

    def append(self, result: dict, tag: str, n: int = 1, mean: bool = True):
        for k, v in result.items():
            name = f"{tag}/{k}"
            self.tracker[name] = v
            self.counter[name] += n
            if mean and isinstance(v, Number):
                c = self.counter[name]
                self.mean[name] = ((c - n) * self.mean[name] + n * float(v)) / c

    def write(self, tag: str, metric_names: list):
        info = []
        for k in metric_names:
            name = f"{tag}/{k}"
            s = self.mean[name]
            info.append(f"{k}: {s:.4f}")
            if self._fh is not None or self._tb is not None:
                self.iterator[name] += 1
            if self._fh is not None:
                self._fh.write(json.dumps(
                    {"name": name, "value": s, "step": self.iterator[name],
                     "time": time.time()}) + "\n")
            if self._tb is not None:
                self._tb.add_scalar(name, s, self.iterator[name])
        header = self.tracker.get(f"{tag}/info", [])
        line = "  ".join(list(header[:2]) + info + list(header[2:]))
        print(line)
        if self._tb is not None:
            # reference src/logger.py:75-78: the formatted info line as text
            info_name = f"{tag}/info"
            self.iterator[info_name] += 1
            self._tb.add_text(info_name, line, self.iterator[info_name])
        if self._fh is not None:
            self._fh.flush()

    def flush(self):
        if self._fh is not None:
            self._fh.flush()
        if self._tb is not None:
            self._tb.flush()

    # pickling: drop the live sinks (re-opened by safe(True) after resume)
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_fh"] = None
        d["_tb"] = None
        return d

    def __setstate__(self, d):
        # checkpoints pickled before the tensorboard backend existed
        d.setdefault("backend", "jsonl")
        d.setdefault("_tb", None)
        self.__dict__.update(d)
