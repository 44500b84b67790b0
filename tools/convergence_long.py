#!/usr/bin/env python
"""Long-horizon convergence + crash/resume-equality artifact (VERDICT r3
task 6): a 50-epoch MCGAN run through the full production Experiment with
per-epoch classifier-feature IS/FID, and a second run KILLED mid-epoch 21
(after the epoch-20 checkpoint landed, before epoch 21's) then resumed with
resume_mode=1 — the resumed run must land in the exact final state of the
uninterrupted one, proving the async checkpointer + scheduler/rng state
carry a realistic horizon. Writes docs/artifacts/convergence_long_mcgan.json.

Usage (repo root, real chip): python tools/convergence_long.py [--epochs 50]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon

from mcgm_tpu.config import apply_control_name, load_config, process_control
from mcgm_tpu.train.loop import Experiment


def make_cfg(model_name, control_name, epochs, out_dir, resume_mode=0):
    cfg = load_config()
    cfg = apply_control_name(cfg, control_name)
    cfg.update(model_name=model_name, data_name="Synthetic",
               output_dir=out_dir, num_epochs=epochs,
               resume_mode=resume_mode)
    cfg = process_control(cfg)
    if model_name == "mcgan":
        cfg["generate_per_mode"] = 100  # 1000 eval images -> usable FID curve
    return cfg


class _CrashAt(Experiment):
    """Dies inside epoch ``crash_epoch``'s eval — after that epoch's train
    steps ran but BEFORE its checkpoint was written (worst-case kill point:
    everything since the last checkpoint is lost)."""

    crash_epoch = 21

    def test_epoch(self, epoch):
        if epoch == self.crash_epoch:
            raise RuntimeError(f"simulated crash mid-epoch {epoch}")
        super().test_epoch(epoch)


def final_state(exp):
    return {
        "g_params": exp.ts.g_params, "d_params": exp.ts.d_params,
        "state": exp.ts.state, "g_opt": exp.ts.g_opt_state,
        "d_opt": exp.ts.d_opt_state, "rng": exp.ts.rng,
    }


def tree_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    # structure mismatch must not silently truncate the zip into a bogus
    # "bit-equal" verdict — align by path, report asymmetries
    da = {jax.tree_util.keystr(p): x for p, x in la}
    db = {jax.tree_util.keystr(p): y for p, y in lb}
    mism = [(k, float("nan")) for k in da.keys() ^ db.keys()]
    for k in da.keys() & db.keys():
        x, y = np.asarray(da[k]), np.asarray(db[k])
        if not np.array_equal(x, y):
            mism.append((k, float(np.abs(x.astype(np.float64)
                                         - y.astype(np.float64)).max())))
    return mism


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--cls-epochs", type=int, default=10)
    ap.add_argument("--out", default="/tmp/mcgm_long")
    ap.add_argument("--skip-resume-leg", action="store_true",
                    help="trajectory-only run (no crash/resume leg); used "
                         "for the 200-epoch reference-horizon artifact — "
                         "resume equality is already proven at 50 epochs")
    ap.add_argument("--resume", action="store_true",
                    help="run A with resume_mode=1: continue from its "
                         "existing checkpoint (recovery after an external "
                         "kill/infra fault mid-run)")
    ap.add_argument("--artifact", default="convergence_long_mcgan.json",
                    help="artifact filename under docs/artifacts/")
    args = ap.parse_args()
    dir_a, dir_b = args.out + "_a", args.out + "_b"

    # feature model once, shared into both runs' output dirs
    rm = 1 if args.resume else 0
    exp_c = Experiment(make_cfg("classifier", "None", args.cls_epochs, dir_a,
                                resume_mode=rm))
    t0 = time.time()
    log_c = exp_c.run()
    print(f"classifier: {time.time() - t0:.0f}s, "
          f"acc -> {log_c.history['test/Accuracy'][-1]:.1f}")
    os.makedirs(os.path.join(dir_b, "model"), exist_ok=True)
    for f in os.listdir(os.path.join(dir_a, "model")):
        if "classifier" in f:
            shutil.copy(os.path.join(dir_a, "model", f),
                        os.path.join(dir_b, "model", f))

    # A: uninterrupted
    exp_a = Experiment(make_cfg("mcgan", "0.5", args.epochs, dir_a,
                                resume_mode=rm))
    t0 = time.time()
    log_a = exp_a.run()
    wall_a = time.time() - t0
    print(f"run A (uninterrupted {args.epochs} epochs): {wall_a:.0f}s")

    if args.skip_resume_leg:
        hist_a = {k: [round(float(v), 4) for v in vs]
                  for k, vs in log_a.history.items()}
        artifact = {
            "description": f"{args.epochs}-epoch MCGAN Synthetic "
                           "convergence through the production Experiment "
                           "(fused on-device IS/FID eval each epoch) on one "
                           "v5e chip — the reference's 200-epoch protocol "
                           "horizon (config.yml:41); crash/resume equality "
                           "proven separately at 50 epochs",
            "device": str(jax.devices()[0]),
            "epochs": args.epochs,
            # with --resume this times only the resumed leg, not the full
            # horizon — label it honestly
            ("wall_s_final_leg" if args.resume else "wall_s_uninterrupted"):
                round(wall_a, 1),
            "resumed": bool(args.resume),
            "eval_s_last_epoch": round(
                getattr(exp_a, "_last_eval_seconds", -1), 3),
            "history": hist_a,
        }
        dest = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "artifacts", args.artifact)
        with open(dest, "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", dest)
        return

    # B: crash mid-epoch 21, then resume_mode=1 to the same horizon
    exp_b1 = _CrashAt(make_cfg("mcgan", "0.5", args.epochs, dir_b))
    crashed = False
    t0 = time.time()
    try:
        exp_b1.run()
    except RuntimeError as e:
        crashed = True
        print(f"crashed as planned: {e} ({time.time() - t0:.0f}s)")
    assert crashed
    exp_b2 = Experiment(make_cfg("mcgan", "0.5", args.epochs, dir_b,
                                 resume_mode=1))
    t0 = time.time()
    log_b = exp_b2.run()
    print(f"run B resume leg: {time.time() - t0:.0f}s")

    mism = tree_equal(final_state(exp_a), final_state(exp_b2))
    hist_a = {k: [round(float(v), 4) for v in vs]
              for k, vs in log_a.history.items()}
    hist_b = {k: [round(float(v), 4) for v in vs]
              for k, vs in log_b.history.items()}
    same_hist = all(hist_a[k] == hist_b[k]
                    for k in ("test/InceptionScore", "test/FID"))
    print(f"state equal: {not mism} (mismatches: {mism[:5]}), "
          f"IS/FID history equal: {same_hist}")

    artifact = {
        "description": "50-epoch MCGAN Synthetic convergence through the "
                       "production Experiment (fused on-device IS/FID eval "
                       "each epoch) + crash at epoch 21 / resume_mode=1 "
                       "equality proof on one v5e chip",
        "device": str(jax.devices()[0]),
        "epochs": args.epochs,
        "wall_s_uninterrupted": round(wall_a, 1),
        "eval_s_last_epoch": round(getattr(exp_a, "_last_eval_seconds", -1), 3),
        "resume": {"crash_epoch": _CrashAt.crash_epoch,
                   "final_state_bit_equal": not mism,
                   "mismatches": mism[:10],
                   "is_fid_history_equal": bool(same_hist)},
        "history": hist_a,
    }
    dest = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts", args.artifact)
    with open(dest, "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", dest)
    if mism or not same_hist:
        sys.exit(1)


if __name__ == "__main__":
    main()
