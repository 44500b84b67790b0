"""Result aggregation (reference src/process.py).

Walks ``output/result`` for per-seed artifacts — ``{tag}.pkl`` logger dumps
and ``is_/fid_/dbi_*.npy`` scalars — and aggregates each
(data, model, control) cell over seeds into mean/std/max/min (+ argmax/argmin
seed), written to ``output/processed_result.json``.
"""

from __future__ import annotations

import json
import os
import re
from collections import defaultdict

import numpy as np

from ..utils import load, makedir_exist_ok


def _cell_of(tag: str) -> tuple[str, str]:
    """Split '{seed}_{rest}' → (seed, cell)."""
    seed, _, rest = tag.partition("_")
    return seed, rest


def collect_results(output_dir: str = "./output") -> dict:
    """cell → metric → {seed: value}."""
    rdir = os.path.join(output_dir, "result")
    results: dict = defaultdict(lambda: defaultdict(dict))
    if not os.path.isdir(rdir):
        return results
    for fn in sorted(os.listdir(rdir)):
        path = os.path.join(rdir, fn)
        if fn.endswith(".pkl"):
            tag = fn[:-4]
            seed, cell = _cell_of(tag)
            payload = load(path)
            logger = payload["logger"]
            for name, hist in logger.history.items():
                if name.endswith("/info") or not hist:
                    continue
                results[cell][name][seed] = float(hist[-1])
        elif fn.endswith(".npy"):
            m = re.match(r"(is|fid|dbi)_(generated|created)_(.+)\.npy$", fn)
            if not m:
                continue
            metric = {"is": "InceptionScore", "fid": "FID", "dbi": "DBI"}[m.group(1)]
            tag = m.group(3)
            seed, cell = _cell_of(tag)
            value = float(np.load(path, allow_pickle=True))
            results[cell][f"{m.group(2)}/{metric}"][seed] = value
    return results


def summarize(results: dict) -> dict:
    """Aggregate per-seed values to mean/std/max/min.

    Non-finite seed values (diverged runs — e.g. glow's all-NaN eval loss
    reporting NaN) are EXCLUDED from the statistics and surfaced as
    ``n_diverged`` + ``diverged_seeds`` instead of being silently averaged.
    A cell with no finite seeds reports null statistics.
    """
    out = {}
    for cell, metrics in results.items():
        out[cell] = {}
        for name, per_seed in metrics.items():
            seeds = sorted(per_seed)
            all_vals = np.asarray([per_seed[s] for s in seeds], dtype=float)
            finite = np.isfinite(all_vals)
            entry = {"n_seeds": len(seeds)}
            if not finite.all():
                entry["n_diverged"] = int((~finite).sum())
                entry["diverged_seeds"] = [s for s, f in zip(seeds, finite)
                                           if not f]
            if finite.any():
                vals = all_vals[finite]
                fseeds = [s for s, f in zip(seeds, finite) if f]
                entry.update({
                    "mean": float(vals.mean()),
                    "std": float(vals.std()),
                    "max": float(vals.max()),
                    "min": float(vals.min()),
                    "argmax": fseeds[int(vals.argmax())],
                    "argmin": fseeds[int(vals.argmin())],
                })
            else:
                entry.update({"mean": None, "std": None, "max": None,
                              "min": None, "argmax": None, "argmin": None})
            out[cell][name] = entry
    return out


def process(output_dir: str = "./output") -> dict:
    summary = summarize(collect_results(output_dir))
    makedir_exist_ok(output_dir)
    with open(os.path.join(output_dir, "processed_result.json"), "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    return summary


def make_vis(summary: dict, output_dir: str = "./output",
             pivot: str = "generated/InceptionScore") -> str:
    """Emit a shell script re-running generate/transit/create for the best
    seed of each cell (reference process.py:101-142 ``make_vis``).

    The reference hardcodes the max-better IS pivot (process.py:120-122);
    this version accepts any metric, so "best" follows the metric's
    direction — min-better names (FID/Loss/NLL/MSE/BCE/DBI) use ``argmin``.
    """
    min_better = ("fid", "loss", "nll", "mse", "bce", "dbi")
    arg = ("argmin" if any(m in pivot.lower() for m in min_better)
           else "argmax")
    lines = ["#!/bin/bash"]
    for cell, metrics in sorted(summary.items()):
        if pivot not in metrics:
            continue
        best_seed = metrics[pivot][arg]
        if best_seed is None:  # every seed diverged — nothing to visualize
            continue
        parts = cell.split("_")
        # cell = {data}_{subset}_{model}[_{rate}]
        data, subset, model = parts[0], parts[1], parts[2]
        control = parts[3] if len(parts) > 3 else "None"
        base = (f"--data_name {data} --subset {subset} --model_name {model} "
                f"--control_name {control} --init_seed {best_seed}")
        for script in ("generate", "transit", "create"):
            lines.append(f"python {script}.py {base}")
    path = os.path.join(output_dir, "vis.sh")
    makedir_exist_ok(output_dir)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "./output"
    make_vis(process(out), out)
