"""Streaming per-channel image statistics (reference utils.py:195-234).

The reference computes dataset-level channel mean/std with a Welford-style
streaming merge and caches them under ``./data/stats/{name}.pt``; it is part
of the utils surface (unused by the main training paths, same here). This
version runs over the packed uint8 array in chunks — no epoch of PIL decodes.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import load, makedir_exist_ok, save


class Stats:
    """Welford-merge accumulator for per-channel mean/std over NHWC uint8."""

    def __init__(self, n_channels: int):
        self.n_channels = n_channels
        self.count = 0
        self.mean = np.zeros(n_channels, np.float64)
        self.m2 = np.zeros(n_channels, np.float64)

    def update(self, img: np.ndarray) -> None:
        """Merge a [N, H, W, C] uint8/float chunk (values scaled to [0,1])."""
        x = np.asarray(img, np.float64) / (255.0 if img.dtype == np.uint8 else 1.0)
        x = x.reshape(-1, x.shape[-1])
        n_b = x.shape[0]
        mean_b = x.mean(axis=0)
        m2_b = ((x - mean_b) ** 2).sum(axis=0)
        delta = mean_b - self.mean
        total = self.count + n_b
        self.mean += delta * (n_b / total)
        self.m2 += m2_b + delta ** 2 * (self.count * n_b / total)
        self.count = total

    @property
    def std(self) -> np.ndarray:
        return np.sqrt(self.m2 / max(self.count - 1, 1))

    def state(self) -> dict:
        return {"mean": self.mean.tolist(), "std": self.std.tolist(),
                "count": self.count}


def make_stats(dataset, data_dir: str = "./data",
               chunk: int = 4096, recompute: bool = False) -> Stats:
    """Channel stats of an ArrayDataset, cached at data/stats/{name}.pkl."""
    cache_dir = os.path.join(data_dir, "stats")
    path = os.path.join(cache_dir, f"{dataset.data_name}.pkl")
    if not recompute and os.path.exists(path):
        return load(path)
    stats = Stats(dataset.img.shape[-1])
    for i in range(0, len(dataset), chunk):
        stats.update(dataset.img[i:i + chunk])
    makedir_exist_ok(cache_dir)
    save(stats, path)
    return stats
