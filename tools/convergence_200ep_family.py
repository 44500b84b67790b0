#!/usr/bin/env python
"""200-epoch protocol-horizon run for a stateful non-GAN family (VERDICT r4
task #7): the reference's full num_epochs=200 (reference config.yml:41)
through the production Experiment — per-epoch eval, ReduceLROnPlateau,
async checkpointing, dispatch watchdog — proving the epoch loop holds up at
protocol duration. Writes docs/artifacts/convergence_200ep_<model>.json
with every logged series.

Usage (repo root, real chip):
  python tools/convergence_200ep_family.py --model mcglow [--epochs 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon

from mcgm_tpu.config import apply_control_name, load_config, process_control
from mcgm_tpu.train.loop import Experiment


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mcglow")
    ap.add_argument("--control", default="0.5")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--out", default="/tmp/mcgm_200ep_fam")
    args = ap.parse_args()

    cfg = load_config()
    cfg = apply_control_name(cfg, args.control)
    cfg.update(model_name=args.model, data_name="Synthetic",
               output_dir=args.out, num_epochs=args.epochs, resume_mode=0,
               dispatch_timeout=900)
    cfg = process_control(cfg)
    exp = Experiment(cfg)
    t0 = time.time()
    logger = exp.run()
    wall = time.time() - t0
    hist = {k: [float(v) for v in h] for k, h in logger.history.items()}
    key = "test/Loss"
    finite = [v for v in hist.get(key, []) if np.isfinite(v)]
    rows = {
        "_what": (f"{args.model} Synthetic {args.epochs}-epoch protocol "
                  "horizon through the production Experiment (per-epoch "
                  "eval, ReduceLROnPlateau, async checkpoints, dispatch "
                  "watchdog) — VERDICT r4 task #7"),
        "model": args.model,
        "epochs": args.epochs,
        "wall_s": round(wall, 1),
        "device": str(jax.devices()[0]),
        "final_test_Loss": hist.get(key, [None])[-1],
        "best_test_Loss": min(finite) if finite else None,
        "n_diverged_epochs": int(len(hist.get(key, [])) - len(finite)),
        "history": hist,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        f"convergence_200ep_{args.model}.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}: {args.epochs} epochs in {wall:.0f}s, "
          f"final {key}={rows['final_test_Loss']}, best={rows['best_test_Loss']}")


if __name__ == "__main__":
    main()
