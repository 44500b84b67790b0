#!/usr/bin/env python
"""Run the REFERENCE's cglow (torch, CPU) on our Synthetic data to settle
whether the cglow seed divergence is a port bug or reference-matching
(round-5 VERDICT #2).

This imports the reference's own model class from /root/reference/src —
nothing is copied; the reference code is executed as-is (the same way the
torch-parity fixtures were produced) — and trains it with the reference's
exact protocol: DDI on num_init_batches, Adam lr 3e-4, clip_grad_norm 1.0
(reference train_glow.py:37,116-121). Data is the same Synthetic blob set
our cells train on, normalized the reference way (ToTensor + Normalize(.5)
=> [-1,1], reference data.py:19-24).

CPU-sized by default (--hidden 128 --K 8): the full 512/K16 model is
infeasible on this 1-core host; run our implementation at the SAME reduced
config (tools/diag_cglow_divergence.py --hidden 128 --K 8) for the matched
comparison.

Usage: python tools/repro_reference_cglow.py --seeds 4 5 6 7 [--epochs 2]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src"
sys.path.insert(0, REPO)

import numpy as np


def build_reference_model(hidden, K, L, classes_size):
    os.chdir(REF)  # `from config import cfg` reads config.yml from cwd
    sys.path.insert(0, REF)
    import config as ref_config

    cfg = ref_config.cfg
    cfg["device"] = "cpu"
    cfg["model_name"] = "cglow"
    cfg["data_shape"] = [3, 32, 32]
    cfg["classes_size"] = classes_size
    cfg["glow"] = {"hidden_size": hidden, "K": K, "L": L,
                   "affine": True, "conv_lu": True}
    from models.cglow import cglow as make_cglow

    return make_cglow(), cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, nargs="+", default=[4, 5, 6, 7])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--L", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--init-batches", type=int, default=8)
    ap.add_argument("--steps", type=int, default=None,
                    help="cap train steps per epoch (CPU budget)")
    args = ap.parse_args()

    import torch

    from mcgm_tpu.data.datasets import fetch_dataset

    ds = fetch_dataset("Synthetic", verbose=False)
    # reference normalization: ToTensor + Normalize(0.5,0.5) => [-1, 1], NCHW
    tr_img = torch.from_numpy(
        ds["train"].img.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    tr_img = (tr_img - 0.5) / 0.5
    tr_lab = torch.from_numpy(ds["train"].labels.astype(np.int64))
    te_img = torch.from_numpy(
        ds["test"].img.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    te_img = (te_img - 0.5) / 0.5
    te_lab = torch.from_numpy(ds["test"].labels.astype(np.int64))

    results = {}
    for seed in args.seeds:
        torch.manual_seed(seed)
        model, cfg = build_reference_model(args.hidden, args.K, args.L, 10)
        g = torch.Generator().manual_seed(seed)
        perm = torch.randperm(len(tr_img), generator=g)
        img, lab = tr_img[perm], tr_lab[perm]
        B = args.batch
        n_init = args.init_batches * B
        # reference DDI: one forward over the stacked init batches
        # (train_glow.py:60-67)
        model.train(True)
        with torch.no_grad():
            model({"img": img[:n_init], "label": lab[:n_init]})
        opt = torch.optim.Adam(model.parameters(), lr=args.lr)
        hist = []
        for epoch in range(1, args.epochs + 1):
            perm = torch.randperm(len(img), generator=g)
            img, lab = img[perm], lab[perm]
            model.train(True)
            losses = []
            n_steps = len(img) // B if args.steps is None else args.steps
            for i in range(n_steps):
                b = {"img": img[i * B:(i + 1) * B],
                     "label": lab[i * B:(i + 1) * B]}
                opt.zero_grad()
                out = model(b)
                out["loss"].backward()
                torch.nn.utils.clip_grad_norm_(model.parameters(), 1)
                opt.step()
                losses.append(float(out["loss"]))
            model.train(False)
            with torch.no_grad():
                ev = model({"img": te_img[:2 * B], "label": te_lab[:2 * B]})
            ev_loss = float(ev["loss"])
            hist.append((np.mean(losses), ev_loss))
            print(f"seed {seed} epoch {epoch}: "
                  f"train {np.mean(losses):10.4f}  eval {ev_loss:10.4f}",
                  flush=True)
        results[seed] = hist
    n_div = sum(1 for h in results.values()
                if not np.isfinite(h[-1][1]))
    print(f"\nreference cglow @ hidden={args.hidden} K={args.K}: "
          f"{n_div}/{len(results)} seeds non-finite eval after "
          f"{args.epochs} epochs")
    for s, h in results.items():
        print(f"  seed {s}: {[(round(a,2), round(b,2)) for a, b in h]}")


if __name__ == "__main__":
    main()
