"""Experiment logger.

Behavioral port of reference src/logger.py: batch-size-weighted running means
per tag/metric, per-epoch history snapshots (``safe(False)``), formatted info
lines. TensorBoard event writing is replaced with an append-only JSONL scalar
log next to the run directory (dependency-light, trivially greppable); the
history rides inside checkpoints exactly like the reference's pickled Logger,
which is how learning curves are recovered
(reference make_learning_curve.py:40-48).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from numbers import Number


class Logger:
    def __init__(self, log_path: str | None = None):
        self.log_path = log_path
        self.tracker = {}
        self.counter = defaultdict(int)
        self.mean = defaultdict(float)
        self.history = defaultdict(list)
        self.iterator = defaultdict(int)
        self._fh = None

    def safe(self, write: bool):
        if write:
            if self.log_path:
                os.makedirs(self.log_path, exist_ok=True)
                self._fh = open(os.path.join(self.log_path, "scalars.jsonl"), "a")
        else:
            if self._fh is not None:
                self._fh.close()
                self._fh = None
            for name in self.mean:
                self.history[name].append(self.mean[name])

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
            if self._fh is not None:
                self.iterator[name] += 1
                self._fh.write(json.dumps(
                    {"name": name, "value": s, "step": self.iterator[name],
                     "time": time.time()}) + "\n")
        header = self.tracker.get(f"{tag}/info", [])
        line = "  ".join(list(header[:2]) + info + list(header[2:]))
        print(line)
        if self._fh is not None:
            self._fh.flush()

    def flush(self):
        if self._fh is not None:
            self._fh.flush()

    # pickling: drop the file handle
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_fh"] = None
        return d
