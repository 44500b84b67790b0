#!/usr/bin/env python
"""On-TPU convergence artifact for the remaining model families.

Companion to tools/convergence_run.py (classifier + MCGAN): trains MCVAE,
VQVAE, MCPixelCNN (on the VQVAE's frozen codes, the reference
train_pixelcnn.py:44-45 chain) and MCGlow for N epochs each on the
deterministic Synthetic dataset (zero-egress env — no CIFAR10 here) with
the full production Experiment path, and dumps every logged metric series
to docs/artifacts/convergence_families_synthetic.json.

Usage (repo root, real chip): python tools/convergence_families.py [--epochs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon

from mcgm_tpu.config import apply_control_name, load_config, process_control
from mcgm_tpu.train.loop import Experiment

# model -> (control_name, headline metrics to print)
RUNS = [
    ("mcvae", "0.5", ["test/Loss", "test/BCE"]),
    ("vqvae", "None", ["test/Loss", "test/MSE"]),
    ("mcpixelcnn", "0.5", ["test/Loss", "test/NLL"]),
    ("mcglow", "0.5", ["test/Loss"]),
]


def run(model_name: str, control_name: str, epochs: int, out_dir: str):
    cfg = load_config()
    cfg = apply_control_name(cfg, control_name)
    cfg.update(model_name=model_name, data_name="Synthetic",
               output_dir=out_dir, num_epochs=epochs, resume_mode=0)
    cfg = process_control(cfg)
    exp = Experiment(cfg)
    t0 = time.time()
    logger = exp.run()
    return exp, logger, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--out", default="/tmp/mcgm_convergence_fam")
    args = ap.parse_args()

    artifact = {
        "description": "full production Experiment path per family on one "
                       "TPU v5e chip, Synthetic dataset (zero-egress env); "
                       "mcpixelcnn trains on the frozen codes of the vqvae "
                       "trained in the same run",
        "device": str(jax.devices()[0]),
        "epochs": args.epochs,
        "families": {},
    }
    for model_name, control, heads in RUNS:
        exp, logger, wall = run(model_name, control, args.epochs, args.out)
        hist = {k: [round(float(v), 4) for v in vs]
                for k, vs in logger.history.items()}
        artifact["families"][model_name] = {
            "tag": exp.tag, "wall_s": round(wall, 1), "history": hist}
        msg = ", ".join(f"{h} {hist[h][0]:.3f}->{hist[h][-1]:.3f}"
                        for h in heads if h in hist)
        print(f"{model_name}: {msg} ({wall:.0f}s)", flush=True)

    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        "convergence_families_synthetic.json")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
