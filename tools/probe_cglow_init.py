#!/usr/bin/env python
"""Forward-only probe of the post-DDI glow init at any size (round-5
cglow root-cause): per-block logdet / log_p / loss on the first batches,
BEFORE any training step. If the init is already hot (loss >> ~8 bits/dim)
the divergence is an initialization problem, not an optimization one.

Usage: python tools/probe_cglow_init.py --model cglow --seed 4
           [--hidden 512 --K 16 --L 3 --batch 128] [--f32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--L", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--model", default="cglow", choices=("cglow", "mcglow"))
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-batches", type=int, default=4)
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)

    from mcgm_tpu.config import apply_control_name, load_config, process_control
    from mcgm_tpu.data import fetch_dataset, make_data_loader, process_dataset
    from mcgm_tpu.models import build_model
    from mcgm_tpu.train.state import jit_init

    cfg = load_config()
    cfg = apply_control_name(cfg, "None" if args.model == "cglow" else "0.5")
    cfg.update(model_name=args.model, data_name="Synthetic",
               init_seed=args.seed, derive_model_params=False)
    cfg = process_control(cfg)
    cfg["glow"] = {"hidden_size": args.hidden, "K": args.K, "L": args.L,
                   "affine": True, "conv_lu": True, "scan_flows": True}
    cfg["batch_size"] = {"train": args.batch, "test": args.batch}
    dataset = fetch_dataset(cfg["data_name"], cfg["subset"])
    cfg = process_dataset(dataset["train"], cfg)
    model = build_model(cfg)

    loader = make_data_loader(dataset, cfg, seed=args.seed)["train"]
    rng = jax.random.PRNGKey(args.seed)
    init_rng, noise_rng = jax.random.split(rng)
    first = next(iter(loader))
    init_b = {"img": first["img"][:2], "label": first["label"][:2]}
    variables = jit_init(model, {"params": init_rng, "z": init_rng,
                                 "noise": init_rng}, init_b, train=True)

    loader.set_epoch(0)
    imgs, labels = [], []
    for i, b in enumerate(loader):
        if i >= cfg.get("num_init_batches", 8):
            break
        imgs.append(b["img"])
        labels.append(b["label"])
    ddi_b = {"img": jnp.concatenate(imgs), "label": jnp.concatenate(labels)}

    @jax.jit
    def ddi(variables, batch, key):
        _, mut = model.apply(variables, batch, train=True, ddi=True,
                             rngs={"noise": key}, mutable=True)
        return {**variables, **mut}

    variables = ddi(variables, ddi_b, noise_rng)

    # per-row loss + per-block pieces, forward only
    from mcgm_tpu.ops.controller import one_hot

    @jax.jit
    def pieces(variables, batch, key):
        indicator = one_hot(batch["label"], model.num_mode)
        x = batch["img"] * 0.5
        noise = jax.random.uniform(key, x.shape, x.dtype)
        x = x + noise / 256.0

        def inner(mdl):
            out = []
            h = x
            for blk in mdl.blocks:
                h, det, log_p, _ = blk(h, indicator)
                out.append((det, log_p))
            return out

        return model.apply(variables, method=lambda mdl: inner(mdl))

    loader.set_epoch(1)
    n_pix = float(np.prod(cfg["data_shape"]))
    import math

    for i, b in enumerate(loader):
        if i >= args.n_batches:
            break
        noise_rng, sk = jax.random.split(noise_rng)
        out = pieces(variables, {"img": b["img"], "label": b["label"]}, sk)
        total_lp, total_det = None, None
        print(f"batch {i}:")
        for j, (det, log_p) in enumerate(out):
            lp = np.asarray(log_p, np.float64)
            d = np.broadcast_to(np.asarray(det, np.float64), lp.shape)
            print(f"  block {j}: logdet mean={d.mean():14.1f} "
                  f"min={d.min():14.1f} max={d.max():14.1f} "
                  f"finite={np.isfinite(d).mean():5.1%} | "
                  f"log_p mean={lp.mean():14.1f} "
                  f"min={lp.min():14.1f} max={lp.max():14.1f} "
                  f"finite={np.isfinite(lp).mean():5.1%}")
            total_lp = lp if total_lp is None else total_lp + lp
            total_det = d if total_det is None else total_det + d
        loss_rows = -(-math.log(256.0) * n_pix + total_det + total_lp) / (
            math.log(2.0) * n_pix)
        fin = np.isfinite(loss_rows)
        print(f"  loss rows: mean={np.nanmean(loss_rows[fin]) if fin.any() else float('nan'):10.3f} "
              f"finite={fin.mean():5.1%} "
              f"min={np.nanmin(loss_rows[fin]) if fin.any() else float('nan'):10.3f} "
              f"max={np.nanmax(loss_rows[fin]) if fin.any() else float('nan'):10.3f}")


if __name__ == "__main__":
    main()
