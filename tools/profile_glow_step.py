#!/usr/bin/env python
"""Measure the LU-invconv share of the full-size MCGlow train step on TPU.

VERDICT round-1 missing #5: the native-tier LU-invconv kernel (SURVEY §2.11
item 3) was skipped without a measurement. This script provides it two ways:

1. FLOP accounting: invconv is [B*H*W, C] @ [C, C] per flow at C in
   {12, 24, 48} — vs the 512-wide 3x3 coupling convs.
2. A jax.profiler trace of the real train step, summarized per-op
   (reuses tools/profile_gan_step.summarize_trace).

Usage: python tools/profile_glow_step.py [--steps 5] [--outdir /tmp/glow_trace]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon

from profile_gan_step import summarize_trace


def invconv_flop_share(B=128, res=32, hidden=512, K=16, L=3, affine=True):
    """Analytic forward-FLOP share of the invconv matmuls."""
    total_coupling = 0
    total_invconv = 0
    C, H = 3, res
    for lvl in range(L):
        C, H = C * 4, H // 2  # squeeze
        cin = C // 2 if affine else C  # coupling sees half the channels
        cout = C if affine else C // 2
        per_flow_coupling = 2 * B * H * H * 9 * (
            cin * hidden + hidden * hidden + hidden * cout)
        per_flow_invconv = 2 * B * H * H * C * C
        total_coupling += K * per_flow_coupling
        total_invconv += K * per_flow_invconv
        if lvl != L - 1:
            C = C // 2  # split
    total = total_coupling + total_invconv
    print(f"coupling convs: {total_coupling/1e9:.1f} GFLOP, "
          f"invconv matmuls: {total_invconv/1e9:.3f} GFLOP "
          f"({100*total_invconv/total:.3f}% of flow FLOPs)")
    return total_invconv / total


def build_step():
    print(f"scan_unroll={os.environ.get('GLOW_UNROLL', '1')} "
          f"remat_flows={os.environ.get('GLOW_REMAT', '1')} "
          f"scan_chunk={os.environ.get('GLOW_CHUNK', '1')} "
          f"reversible={os.environ.get('GLOW_REV', '0')} "
          f"fp32={os.environ.get('MCGM_FP32', '0')}")
    if os.environ.get("MCGM_FP32", "0") != "1":
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
    from mcgm_tpu.models import build_model
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (TrainState, jit_init, make_train_step,
                                      split_variables)

    cfg = {
        "model_name": "mcglow", "classes_size": 10, "controller_rate": 0.5,
        "data_name": "CIFAR10", "data_shape": [32, 32, 3],
        "glow": {"hidden_size": 512, "K": 16, "L": 3, "affine": True,
                 "conv_lu": True, "scan_flows": True,
                 "scan_unroll": int(os.environ.get("GLOW_UNROLL", "1")),
                 "remat_flows": os.environ.get("GLOW_REMAT", "1") == "1",
                 "scan_chunk": int(os.environ.get("GLOW_CHUNK", "1")),
                 "reversible_flows": os.environ.get("GLOW_REV", "0") == "1"},
    }
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jax.random.uniform(rng, (128, 32, 32, 3), minval=-1, maxval=1),
        "label": jnp.arange(128, dtype=jnp.int32) % 10,
    }
    init_batch = {"img": batch["img"][:2], "label": batch["label"][:2]}
    variables = jit_init(model, {"params": rng, "z": rng, "noise": rng},
                         init_batch, train=True)
    variables = jax.device_put(variables, jax.devices()[0])
    params, state = split_variables(variables)
    opt = make_optimizer({"optimizer_name": "Adam", "lr": 3e-4,
                          "weight_decay": 0}, grad_clip=1.0)
    ts = TrainState(params=params, state=state, opt_state=opt.init(params),
                    rng=jax.random.PRNGKey(1))
    step = jax.jit(make_train_step(model, opt, rng_streams=("noise",)))
    return step, ts, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--outdir", default="/tmp/glow_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    invconv_flop_share()
    step, ts, batch = build_step()
    import time

    for _ in range(3):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"glow train step: {dt*1e3:.1f} ms, "
          f"{128/dt:.0f} img/s (Loss={float(m['loss']):.3f})")
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            ts, m = step(ts, batch)
        jax.block_until_ready(m)
    summarize_trace(args.outdir, args.top)


if __name__ == "__main__":
    main()
