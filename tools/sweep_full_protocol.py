#!/usr/bin/env python
"""12-seed FULL-protocol dress rehearsal on Synthetic (round-3 verdict #5).

Runs the complete reference experiment protocol — all five generative
families plus the classifier, every {c,mc} variant, 12 seeds per cell
(reference src/process.py:12, src/make.py:27) — end to end through the
production orchestration on the egress-free Synthetic dataset:

  make.py emission -> the EMITTED launch scripts as OS processes
    (seed-parallel vmapped runs for the non-GAN families — vqvae/pixelcnn
    auto-split into S=4 groups by SEED_PARALLEL_MAX_S; the GAN family
    trains its 12 seeds as one in-process sequential loop, compiling once)
  -> per-cell test jobs (cli.test_model, 12 seeds per process)
  -> the GAN cells additionally run the reference's npy scoring chain
     (generate.py --save_npy -> test_generated.py, 12 seeds per process)
  -> process.py aggregation

and writes the aggregate (mean/std/min/max/arg* over 12 seeds for every
cell and metric, mirroring reference process.py:85-98) to
``docs/artifacts/sweep_12seed_synthetic.json``.

Cell order matters: classifier first (it is Synthetic's IS/FID feature
model — evals/features.py resolution order), vqvae before pixelcnn (the
frozen per-seed AE, reference train_pixelcnn.py:44-45).

State accumulates in ``--tmp`` (default /tmp/mcgm_sweep12) so families can
run in separate invocations (``--families vae gan``); pass
``--aggregate-only`` to re-run process.py + write the artifact from what
is already on disk.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAM_VARIANTS = {
    "classifier": ["classifier"],
    "vqvae": ["vqvae"],
    "vae": ["cvae", "mcvae"],
    "gan": ["cgan", "mcgan"],
    "glow": ["cglow", "mcglow"],
    "pixelcnn": ["cpixelcnn", "mcpixelcnn"],
}
ORDER = ["classifier", "vqvae", "vae", "gan", "glow", "pixelcnn"]


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


def run_family(fam: str, config: str, tmp: str, seeds, wall: dict,
               sp_max: int = 0):
    n = len(seeds)
    extra_flags = f"--config {config}"
    if sp_max:
        # cap the vmapped group size (train/seed_parallel.py groups) — e.g.
        # when the full-size glow S=12 vmap is too big for one chip's HBM
        extra_flags += f" --seed_parallel_max {sp_max}"
    extra = ["--extra", extra_flags, "--out_dir", tmp]
    if fam == "gan":
        # 12 seeds as one in-process sequential loop per variant — the
        # XLA-compile-once analog of the reference's per-seed GPU jobs
        # (seed_parallel excludes gan: its step is already at MXU ceilings)
        run([sys.executable, "make.py", "--run", "train", "--model", fam,
             "--data", "Synthetic", "--init_seeds", str(seeds[0]),
             "--num_experiments", str(n), *extra])
    else:
        run([sys.executable, "make.py", "--run", "train", "--model", fam,
             "--data", "Synthetic", "--seed_parallel",
             "--init_seeds", *[str(s) for s in seeds], *extra])
    wall[f"train_{fam}_s"] = run(["bash", os.path.join(tmp, f"train_{fam}.sh")])
    run([sys.executable, "make.py", "--run", "test", "--model", fam,
         "--data", "Synthetic", "--init_seeds", str(seeds[0]),
         "--num_experiments", str(n), *extra])
    wall[f"test_{fam}_s"] = run(["bash", os.path.join(tmp, f"test_{fam}.sh")])
    if fam == "gan":
        # the reference's official GAN scoring chain: class-sweep npy dump
        # then IS/FID on the dump (reference generate.py + test_generated.py)
        t0 = time.time()
        for v in FAM_VARIANTS[fam]:
            control = "0.5" if v.startswith("mc") else "None"
            common = ["--data_name", "Synthetic", "--model_name", v,
                      "--control_name", control,
                      "--init_seed", str(seeds[0]),
                      "--num_experiments", str(n), "--config", config]
            run([sys.executable, "generate.py", *common,
                 "--save_npy", "True"])
            run([sys.executable, "test_generated.py", *common])
        wall["gan_npy_chain_s"] = time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=12,
                   help="number of seeds (0..N-1); the protocol is 12")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--device", default="tpu")
    p.add_argument("--tmp", default="/tmp/mcgm_sweep12")
    p.add_argument("--families", nargs="+", default=ORDER, choices=ORDER)
    p.add_argument("--aggregate-only", action="store_true")
    p.add_argument("--sp_max", type=int, default=0,
                   help="forward --seed_parallel_max to the emitted train "
                        "commands (cap vmapped group size; 0 = per-family "
                        "auto)")
    p.add_argument("--out", default=os.path.join(
        ROOT, "docs", "artifacts", "sweep_12seed_synthetic.json"))
    args = p.parse_args()

    os.makedirs(args.tmp, exist_ok=True)
    config = write_config(args.tmp, args)
    seeds = list(range(args.seeds))
    out_dir = os.path.join(args.tmp, "output")
    wall_path = os.path.join(args.tmp, "wall.json")
    wall = (json.load(open(wall_path)) if os.path.exists(wall_path) else {})

    if not args.aggregate_only:
        for fam in [f for f in ORDER if f in args.families]:
            try:
                run_family(fam, config, args.tmp, seeds, wall,
                           sp_max=args.sp_max)
            except subprocess.CalledProcessError as e:
                # keep going: one family's failure (e.g. an OOM at an
                # untested vmapped shape) must not discard the finished
                # legs — state persists in --tmp, so the family can be
                # re-run alone (--families fam) after a fix
                wall[f"FAILED_{fam}"] = str(e)
                print(f"family {fam} FAILED: {e} — continuing", flush=True)
            with open(wall_path, "w") as f:
                json.dump(wall, f, indent=1)

    run([sys.executable, "process.py", out_dir])
    with open(os.path.join(out_dir, "processed_result.json")) as f:
        processed = json.load(f)
    artifact = {
        "protocol": "reference 12-seed full protocol (src/make.py + "
                    "src/process.py): every family x {c,mc} x "
                    f"{len(seeds)} seeds through the production "
                    "orchestration (make.py-emitted scripts as OS "
                    "processes; seed-parallel vmapped training for "
                    "non-GAN families, in-process 12-seed loops for GAN "
                    "and all test/scoring jobs)",
        "dataset": "Synthetic",
        "device": args.device,
        "epochs": args.epochs,
        "seeds": seeds,
        "cells": sorted(processed.keys()),
        "wall_clock_s": wall,
        "processed_result": processed,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    n_cells = len(processed)
    full = [c for c, m in processed.items()
            if all(s.get("n_seeds") == len(seeds) for s in m.values())]
    print(f"wrote {args.out}: {n_cells} cells, "
          f"{len(full)} with all {len(seeds)} seeds")


if __name__ == "__main__":
    main()
