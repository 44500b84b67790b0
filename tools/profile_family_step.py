#!/usr/bin/env python
"""Per-family training-step roofline accounting (vae/vqvae/pixelcnn/
classifier — the families bench_all times but round 3's GAN/Glow profiling
passes did not cover).

For each requested model it builds the PRODUCTION dispatch — the k-step
fused `make_multi_train_step` (cfg steps_per_dispatch, default 8) exactly as
`train/loop.py` runs it — times warm dispatches on the attached chip, pulls
XLA's own cost analysis (FLOPs / bytes accessed) for the compiled program,
and prints both rooflines:

  MXU  roofline ms = flops / (197e12 bf16 FLOP/s on v5e)
  HBM  roofline ms = bytes / (819e9 B/s on v5e)

A step near max(MXU, HBM) is at speed-of-light for its regime; a step far
above both has dispatch/fusion overhead worth attacking. `--trace` adds the
per-op device-time table (and `--traffic` the per-fusion effective GB/s
join) reusing profile_gan_step's machinery.

Reference hot loops these correspond to: src/train_vae.py:121-142,
src/train_vqvae.py:118-138, src/train_pixelcnn.py:125-147,
src/train_classifier.py:118-139.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon

V5E_BF16_FLOPS = 197e12
V5E_HBM_BPS = 819e9


def build_multi_step(model_name: str, k: int, data_name: str = "CIFAR10"):
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
        raise SystemExit("gan has its own tool: tools/profile_gan_step.py")
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

    if k == 1:
        step = jax.jit(raw_step, donate_argnums=0)
        feed = batch
    else:
        def scalar_step(ts, b):
            ts2, aux = raw_step(ts, b)
            return ts2, {"loss": aux["loss"]}

        step = jax.jit(make_multi_train_step(scalar_step, k),
                       donate_argnums=0)
        feed = {kk: jnp.stack([v] * k) for kk, v in batch.items()}
    bs = batch["label"].shape[0]
    return step, ts, feed, bs, cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mcvae,vqvae,mcpixelcnn,classifier")
    ap.add_argument("--k", type=int, default=8,
                    help="steps per dispatch (production default 8)")
    ap.add_argument("--steps", type=int, default=10,
                    help="timed dispatches")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--trace", action="store_true",
                    help="also capture a profiler trace per model")
    ap.add_argument("--traffic", action="store_true",
                    help="with --trace: join HLO bytes, print GB/s per op")
    ap.add_argument("--outdir", default="/tmp/mcgm_trace_family")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()
    if args.traffic and not args.trace:
        ap.error("--traffic needs --trace")

    if not args.fp32:
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)

    from profile_gan_step import _parse_hlo_bytes, summarize_trace

    for name in args.models.split(","):
        step, ts, feed, bs, cfg = build_multi_step(name.strip(), args.k)
        lowered = step.lower(ts, feed)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = ca.get("flops", 0.0)
        byts = ca.get("bytes accessed", 0.0)
        hlo_bytes = _parse_hlo_bytes(compiled.as_text()) if args.traffic \
            else None
        for _ in range(3):
            ts, m = step(ts, feed)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            ts, m = step(ts, feed)
        jax.block_until_ready(m)
        dt = (time.perf_counter() - t0) / args.steps
        imgs = bs * args.k
        mxu_ms = flops / V5E_BF16_FLOPS * 1e3
        hbm_ms = byts / V5E_HBM_BPS * 1e3
        floor = max(mxu_ms, hbm_ms)
        print(f"{name:>12} k={args.k}: {dt*1e3:7.2f} ms/dispatch "
              f"({imgs/dt:10,.0f} img/s)  "
              f"flops {flops/1e9:8.2f} G  bytes {byts/1e6:8.1f} MB  "
              f"MXU {mxu_ms:6.2f} ms  HBM {hbm_ms:6.2f} ms  "
              f"wall/floor {dt*1e3/floor if floor else float('inf'):5.2f}x",
              flush=True)
        if args.trace:
            outdir = os.path.join(args.outdir, name.strip())
            with jax.profiler.trace(outdir):
                for _ in range(args.steps):
                    ts, m = step(ts, feed)
                jax.block_until_ready(m)
            summarize_trace(outdir, args.top, hlo_bytes=hlo_bytes)


if __name__ == "__main__":
    main()
