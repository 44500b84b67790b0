"""Learning-curve recovery and plotting (reference src/make_learning_curve.py):
pull metric histories out of pickled checkpoint loggers and plot mean curves
per cell (c vs mc)."""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np

from ..utils import load, makedir_exist_ok


def curve_from_checkpoint(ckpt_path: str, metric: str = "test/InceptionScore"):
    payload = load(ckpt_path)
    return list(payload["logger"].history.get(metric, []))


def collect_curves(output_dir: str, metric: str) -> dict:
    """cell → list of per-seed curves."""
    mdir = os.path.join(output_dir, "model")
    curves = defaultdict(list)
    if not os.path.isdir(mdir):
        return curves
    for fn in sorted(os.listdir(mdir)):
        if not fn.endswith("_checkpoint.pkl"):
            continue
        tag = fn[: -len("_checkpoint.pkl")]
        _, _, cell = tag.partition("_")
        c = curve_from_checkpoint(os.path.join(mdir, fn), metric)
        if c:
            curves[cell].append(c)
    return curves


def plot_curves(output_dir: str = "./output",
                metrics: tuple = ("test/InceptionScore", "test/FID")):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vis = os.path.join(output_dir, "vis", "curves")
    makedir_exist_ok(vis)
    written = []
    for metric in metrics:
        curves = collect_curves(output_dir, metric)
        if not curves:
            continue
        fig, ax = plt.subplots(figsize=(6, 4))
        for cell, seed_curves in sorted(curves.items()):
            n = min(len(c) for c in seed_curves)
            arr = np.asarray([c[:n] for c in seed_curves])
            ax.plot(np.arange(1, n + 1), arr.mean(0), label=cell)
            if len(seed_curves) > 1:
                ax.fill_between(np.arange(1, n + 1),
                                arr.mean(0) - arr.std(0),
                                arr.mean(0) + arr.std(0), alpha=0.2)
        ax.set_xlabel("epoch")
        ax.set_ylabel(metric)
        ax.legend(fontsize=7)
        path = os.path.join(vis, metric.replace("/", "_") + ".png")
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        written.append(path)
    return written
