#!/usr/bin/env python
"""Seed-parallel throughput A/B on the attached chip.

Builds the PRODUCTION k-step fused dispatch for a family (exactly like
tools/profile_family_step.py) and vmaps it over S stacked seeds — the
train/seed_parallel.py compute path — then reports aggregate images/sec
against S=1 and the implied sweep speedup vs running the S seeds
sequentially (the reference's per-seed-GPU-job protocol, make.py:27).

States are initialized once and tiled to S: per-seed values differ in a
real run but the compiled program and its timing are identical, and
tiling keeps the tool's startup cheap.

Usage: python tools/bench_seed_parallel.py --models mcvae,vqvae,classifier \
           --seeds 1,2,4,8,12 [--k 8] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon


def build(model_name: str, k: int, S: int, data_name: str = "CIFAR10"):
    from bench_all import _batch, _cfg
    from mcgm_tpu.models import build_model
    from mcgm_tpu.train.loop import RNG_STREAMS
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (TrainState, jit_init,
                                      make_multi_train_step, make_train_step,
                                      split_variables)

    cfg = _cfg(model_name, data_name)
    fam = cfg["family"]
    if fam == "gan":
        raise SystemExit("seed_parallel excludes gan by design (DESIGN.md)")
    model = build_model(cfg)
    batch = _batch(cfg, fam)
    rng = jax.random.PRNGKey(0)
    streams = RNG_STREAMS.get(fam, ())
    rngs = {"params": rng, "z": rng, **{s: rng for s in streams}}
    init_b = {kk: v[:2] for kk, v in batch.items()}
    variables = jit_init(model, rngs, init_b, train=True)
    variables = jax.device_put(variables, jax.devices()[0])
    params, state = split_variables(variables)
    opt = make_optimizer(cfg, grad_clip=cfg.get("grad_clip"))
    ts = TrainState(params, state, opt.init(params), jax.random.PRNGKey(1))
    raw_step = make_train_step(model, opt, rng_streams=streams)

    def scalar_step(t, b):
        t2, aux = raw_step(t, b)
        return t2, {"loss": aux["loss"]}

    if S == 1:
        body = scalar_step
        feed1 = batch
    else:
        body = jax.vmap(scalar_step)
        ts = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (S,) + a.shape), ts)
        # distinct per-seed rngs (the real runner stacks per-seed chains)
        ts = type(ts)(ts.params, ts.state, ts.opt_state,
                      jax.vmap(jax.random.PRNGKey)(jnp.arange(S)),
                      ts.step)
        feed1 = {kk: jnp.stack([v] * S) for kk, v in batch.items()}
    if k == 1:
        step = jax.jit(body, donate_argnums=0)
        feed = feed1
    else:
        step = jax.jit(make_multi_train_step(body, k), donate_argnums=0)
        feed = {kk: jnp.stack([v] * k) for kk, v in feed1.items()}
    bs = batch["label"].shape[0]
    return step, ts, feed, bs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mcvae,vqvae,mcpixelcnn,classifier")
    ap.add_argument("--seeds", default="1,2,4,8,12")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write results to this JSON file")
    args = ap.parse_args()

    if not args.fp32:
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)

    results = {}
    for name in args.models.split(","):
        name = name.strip()
        base_dt = None
        results[name] = {}
        for S in [int(s) for s in args.seeds.split(",")]:
            step, ts, feed, bs = build(name, args.k, S)
            for _ in range(3):
                ts, m = step(ts, feed)
            jax.block_until_ready(m)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                ts, m = step(ts, feed)
            jax.block_until_ready(m)
            dt = (time.perf_counter() - t0) / args.steps
            if S == 1:
                base_dt = dt
            agg = bs * args.k * S / dt
            # sweep speedup: S sequential dispatches vs one stacked dispatch
            speedup = (S * base_dt / dt) if base_dt else float("nan")
            results[name][S] = {"ms_per_dispatch": dt * 1e3,
                                "aggregate_img_s": agg,
                                "sweep_speedup_vs_sequential": speedup}
            print(f"{name:>12} S={S:2d} k={args.k}: {dt*1e3:7.2f} ms/dispatch"
                  f"  aggregate {agg:11,.0f} img/s"
                  f"  sweep speedup {speedup:5.2f}x", flush=True)
            del step, ts, feed
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
