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


def build_step(px128: bool = False):
    print(f"scan_unroll={os.environ.get('GLOW_UNROLL', '1')} "
          f"remat_flows={os.environ.get('GLOW_REMAT', '1')} "
          f"scan_chunk={os.environ.get('GLOW_CHUNK', '1')} "
          f"reversible={os.environ.get('GLOW_REV', '0')} "
          f"fp32={os.environ.get('MCGM_FP32', '0')} px128={px128}")
    if os.environ.get("MCGM_FP32", "0") != "1":
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
    from mcgm_tpu.models import build_model
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (TrainState, jit_init, make_train_step,
                                      split_variables)

    # px128: the CelebA-HQ/ImageNet-128 protocol branch — L=5, batch 32
    # (process_control: reference src/utils.py:172-184); never traced before
    # round 5 (VERDICT r4 missing #4).
    res = 128 if px128 else 32
    B = 32 if px128 else 128
    cfg = {
        "model_name": "mcglow", "classes_size": 10, "controller_rate": 0.5,
        "data_name": "CIFAR10", "data_shape": [res, res, 3],
        "glow": {"hidden_size": 512, "K": 16, "L": 5 if px128 else 3,
                 "affine": True,
                 "conv_lu": True, "scan_flows": True,
                 "scan_unroll": int(os.environ.get("GLOW_UNROLL", "1")),
                 "remat_flows": os.environ.get("GLOW_REMAT", "1") == "1",
                 "scan_chunk": int(os.environ.get("GLOW_CHUNK", "1")),
                 "reversible_flows": os.environ.get("GLOW_REV", "0") == "1"},
    }
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jax.random.uniform(rng, (B, res, res, 3), minval=-1, maxval=1),
        "label": jnp.arange(B, dtype=jnp.int32) % 10,
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
    ap.add_argument("--px128", action="store_true",
                    help="profile the 128px L=5 protocol step (batch 32)")
    ap.add_argument("--artifact", default=None,
                    help="write a ceiling-analysis JSON to "
                         "docs/artifacts/<name>")
    ap.add_argument("--no-trace", action="store_true",
                    help="skip the jax.profiler trace (timing+cost only)")
    args = ap.parse_args()

    if args.px128:
        invconv_flop_share(B=32, res=128, K=16, L=5)
    else:
        invconv_flop_share()
    step, ts, batch = build_step(px128=args.px128)
    B = batch["img"].shape[0]
    import json
    import time

    cost = None
    t0 = time.perf_counter()
    for _ in range(3):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    compile_s = time.perf_counter() - t0
    try:
        cost = step.lower(ts, batch).compile().cost_analysis()
    except Exception as e:  # cost analysis is best-effort on some backends
        print(f"cost_analysis unavailable: {e}")
    t0 = time.perf_counter()
    for _ in range(args.steps):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"glow train step: {dt*1e3:.1f} ms, "
          f"{B/dt:.0f} img/s (Loss={float(m['loss']):.3f}), "
          f"first-3-steps (incl. compile) {compile_s:.1f}s")
    if cost:
        tflop = cost.get("flops", 0) / 1e12
        gb = cost.get("bytes accessed", 0) / 1e9
        print(f"program: {tflop:.2f} TFLOP, {gb:.1f} GB accessed, "
              f"HBM roofline at 819 GB/s: {gb / 819 * 1e3:.1f} ms, "
              f"MXU roofline at 197 bf16 TFLOP/s: {tflop / 197 * 1e3:.1f} ms")
    if args.artifact:
        rows = {
            "_what": ("128px MCGlow protocol step (L=5, K=16, hidden 512, "
                      "batch 32, bf16, scan+remat flows) — first-ever trace "
                      "of the process_control 128px glow branch "
                      "(VERDICT r4 missing #4)") if args.px128 else
                     "32px MCGlow protocol step",
            "measured_step_ms": round(dt * 1e3, 1),
            "measured_img_s": round(B / dt),
            "compile_plus_3steps_s": round(compile_s, 1),
            "batch": B,
            "device": str(jax.devices()[0]),
            "tool": "tools/profile_glow_step.py"
                    + (" --px128" if args.px128 else ""),
        }
        if cost:
            rows["program_tflop"] = round(cost.get("flops", 0) / 1e12, 2)
            rows["program_hbm_gb"] = round(
                cost.get("bytes accessed", 0) / 1e9, 1)
            rows["hbm_roofline_ms_at_819gbps"] = round(
                cost.get("bytes accessed", 0) / 819e9 * 1e3, 1)
            rows["mxu_roofline_ms_at_197tflops_bf16"] = round(
                cost.get("flops", 0) / 197e12 * 1e3, 1)
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "artifacts", args.artifact)
        with open(path, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"wrote {path}")
    if not args.no_trace:
        with jax.profiler.trace(args.outdir):
            for _ in range(args.steps):
                ts, m = step(ts, batch)
            jax.block_until_ready(m)
        summarize_trace(args.outdir, args.top)


if __name__ == "__main__":
    main()
