#!/usr/bin/env python
"""Multi-seed sweep through the production orchestration, end to end.

The reference's experimental protocol is "12 seeds x {c,mc} per cell,
aggregated by process.py into mean/std" (reference src/make.py:51-63,
src/process.py:85-98). This tool runs that exact pipeline — make.py emits
the launch scripts, the emitted commands run as OS processes, test_vae
writes result pkls, process.py aggregates — for N seeds of cvae+mcvae on
the egress-free Synthetic dataset, and writes the aggregated JSON plus run
metadata to ``docs/artifacts/sweep_{n}seed_synthetic.json``.

Usage: python tools/sweep_demo.py [--seeds 0 1 2] [--epochs 5] [--device tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def write_config(tmp: str, args) -> str:
    with open(os.path.join(ROOT, "mcgm_tpu", "config.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg.update({
        "device": args.device,
        "data_name": "Synthetic",
        "num_epochs": args.epochs,
        "batch_size": {"train": 128, "test": 128},
        "log_interval": 1.0,
        "output_dir": os.path.join(tmp, "output"),
        "data_dir": os.path.join(tmp, "data"),
    })
    path = os.path.join(tmp, "sweep_config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, cwd=ROOT, check=True, **kw)
    return time.time() - t0


def run_leg(args, config: str, tmp: str, seeds, seed_parallel: bool):
    """One full sweep: make.py emission -> emitted scripts as OS processes
    -> process.py aggregation. Returns (wall_clock dict, processed dict)."""
    out_dir = os.path.join(tmp, "output")
    wall = {}
    sp = ["--seed_parallel"] if seed_parallel else []
    run([sys.executable, "make.py", "--run", "train", "--model", "vae",
         "--data", "Synthetic", "--init_seeds", *seeds, *sp,
         "--extra", f"--config {config}", "--out_dir", tmp])
    run([sys.executable, "make.py", "--run", "test", "--model", "vae",
         "--data", "Synthetic", "--init_seeds", *seeds,
         "--extra", f"--config {config}", "--out_dir", tmp])
    wall["train_s"] = run(["bash", os.path.join(tmp, "train_vae.sh")])
    wall["test_s"] = run(["bash", os.path.join(tmp, "test_vae.sh")])
    run([sys.executable, "process.py", out_dir])
    with open(os.path.join(out_dir, "processed_result.json")) as f:
        processed = json.load(f)
    for cell, metrics in processed.items():
        for name, stats in metrics.items():
            assert stats["n_seeds"] == len(seeds), (cell, name, stats)
    return wall, processed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--compare_seed_parallel", action="store_true",
                   help="run the sweep a second time as collapsed "
                        "seed-parallel jobs (make.py --seed_parallel) and "
                        "record wall-clock + metric deltas vs the "
                        "sequential protocol")
    p.add_argument("--out", default=os.path.join(
        ROOT, "docs", "artifacts", "sweep_3seed_synthetic.json"))
    args = p.parse_args()

    tmp = tempfile.mkdtemp(prefix="mcgm_sweep_")
    config = write_config(tmp, args)
    seeds = [str(s) for s in args.seeds]

    # sequential leg: one job per seed, exactly the reference protocol
    # (--round 1 emits serial `cmd & wait` pairs — one job owns the chip
    # at a time, the reference's single-GPU case)
    wall, processed = run_leg(args, config, tmp, seeds, seed_parallel=False)

    artifact = {
        "protocol": ("reference multi-seed aggregation (src/make.py + "
                     "src/process.py) through the production orchestration: "
                     "make.py-emitted scripts executed as OS processes"),
        "dataset": "Synthetic",
        "variants": ["cvae", "mcvae"],
        "seeds": args.seeds,
        "epochs": args.epochs,
        "device": args.device,
        "wall_clock": wall,
        "processed_result": processed,
    }

    if args.compare_seed_parallel:
        # seed-parallel leg: make.py --seed_parallel collapses each cell's
        # per-seed jobs into ONE vmapped run (train/seed_parallel.py);
        # test/process stay per-seed on its per-seed checkpoints
        tmp_sp = tempfile.mkdtemp(prefix="mcgm_sweep_sp_")
        config_sp = write_config(tmp_sp, args)
        wall_sp, processed_sp = run_leg(args, config_sp, tmp_sp, seeds,
                                        seed_parallel=True)
        deltas = {
            cell: {name: abs(stats["mean"]
                             - processed[cell][name]["mean"])
                   for name, stats in metrics.items()}
            for cell, metrics in processed_sp.items()
        }
        artifact["seed_parallel"] = {
            "wall_clock": wall_sp,
            "processed_result": processed_sp,
            "abs_mean_delta_vs_sequential": deltas,
            "train_speedup": wall["train_s"] / wall_sp["train_s"],
        }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2, sort_keys=True)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
