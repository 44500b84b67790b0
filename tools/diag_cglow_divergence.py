#!/usr/bin/env python
"""Per-batch divergence microscope for the cglow instability (round-5
VERDICT #2).

Replays one seed of the production cglow Synthetic cell exactly like the
Experiment would (same init, DDI, data order, optimizer, clip) but steps
eagerly, printing per batch: loss, logdet, log_p, gradient global norm,
max |param| and which parameter group first goes non-finite. Use to
pinpoint the mechanism (actnorm scale blow-up vs prior log_sd vs coupling
s) rather than just the fact of divergence.

Usage (chip or CPU): python tools/diag_cglow_divergence.py --seed 4
    [--epochs 1] [--hidden 512 --K 16 --L 3] [--batch 128] [--f32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced under axon


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--K", type=int, default=16)
    ap.add_argument("--L", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--model", default="cglow", choices=("cglow", "mcglow"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)

    from mcgm_tpu.config import apply_control_name, load_config, process_control
    from mcgm_tpu.data import fetch_dataset, make_data_loader, process_dataset
    from mcgm_tpu.models import build_model
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (TrainState, jit_init, merge_variables,
                                      split_variables)

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

    # DDI exactly like Experiment._run_ddi: 8 batches stacked
    loader.set_epoch(0)
    init_imgs, init_labels = [], []
    for i, b in enumerate(loader):
        if i >= cfg.get("num_init_batches", 8):
            break
        init_imgs.append(b["img"])
        init_labels.append(b["label"])
    ddi_b = {"img": jnp.concatenate(init_imgs),
             "label": jnp.concatenate(init_labels)}

    @jax.jit
    def ddi(variables, batch, key):
        _, mut = model.apply(variables, batch, train=True, ddi=True,
                             rngs={"noise": key}, mutable=True)
        return {**variables, **mut}

    variables = ddi(variables, ddi_b, noise_rng)
    params, state = split_variables(variables)
    opt = make_optimizer({"optimizer_name": "Adam", "lr": args.lr,
                          "weight_decay": 0}, grad_clip=1.0)
    opt_state = opt.init(params)

    # the Experiment's own step factory (known-good compile path on the
    # tunnel; a separate jit(value_and_grad) of the scan glow traced
    # pathologically slowly there)
    from mcgm_tpu.train.state import make_train_step

    ts = TrainState(params=params, state=state, opt_state=opt.init(params),
                    rng=jax.random.PRNGKey(args.seed + 100))
    train_step = jax.jit(make_train_step(model, opt, rng_streams=("noise",)))

    @jax.jit
    def eval_loss(params, batch, key):
        variables = merge_variables(params, state)
        out = model.apply(variables, batch, train=False, rngs={"noise": key})
        return out["loss"]

    def health(tree, top=3):
        rows = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            a = np.asarray(leaf, np.float32)
            name = "/".join(str(p)[2:-2] if "'" in str(p) else str(p)
                            for p in path)[-70:]
            rows.append((float(np.abs(a).max()) if a.size else 0.0,
                         float(np.isfinite(a).mean()), name))
        rows.sort(reverse=True)
        return rows[:top]

    step_i = 0
    k = noise_rng
    for epoch in range(1, args.epochs + 1):
        loader.set_epoch(epoch)
        for b in loader:
            batch = {"img": b["img"], "label": b["label"]}
            prev_params = ts.params
            ts, aux = train_step(ts, batch)
            loss = float(aux["loss"])
            pmax = health(ts.params, top=1)[0]
            print(f"step {step_i:3d} loss={loss:14.4f} "
                  f"max|p|={pmax[0]:10.3e} finite={pmax[1]:5.1%} "
                  f"({pmax[2]})", flush=True)
            if not np.isfinite(loss) or pmax[1] < 1.0:
                print("  >> params went non-finite; worst leaves:")
                for mx, finite, name in health(ts.params, top=6):
                    print(f"     max|p|={mx:10.3e} finite={finite:5.1%} {name}")
                print("  >> params BEFORE this step:")
                for mx, finite, name in health(prev_params, top=6):
                    print(f"     max|p|={mx:10.3e} finite={finite:5.1%} {name}")
                return
            step_i += 1
        k, ek = jax.random.split(k)
        ev = float(eval_loss(ts.params, batch, ek))
        print(f"epoch {epoch}: eval-mode loss on last batch = {ev:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
