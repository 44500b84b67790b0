#!/usr/bin/env python
"""Benchmark: MCGAN/CIFAR10 training throughput (images/sec/chip).

Runs the full fused training step — 5 discriminator updates + 1 generator
update per batch, spectral-norm power iterations and BatchNorm updates
included, exactly the production step from ``mcgm_tpu.train.state`` — on one
chip with the reference protocol shapes (batch 128, 32x32x3, G hidden 256x4,
D hidden 128x4; reference src/utils.py:156-171, src/train_gan.py:33-55).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": R}

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md — ``"published": {}``), so the baseline is DERIVED and the
derivation is checkable (tools/measure_torch_baseline.py, BASELINE.md):
the reference's full step costs 44.65 GFLOP/image (analytic count validated
against torch.profiler to <2%: G fwd 3.362 vs 3.364, D fwd 0.538 vs 0.545
GFLOP/img; composition 8*G_fwd + 33*D_fwd from the 5:1 protocol with
detached-G D-updates). The reference trains in pure fp32 (no AMP anywhere
in src/), so on the V100 it was written for, throughput is bounded by
15.7 TFLOPS fp32 * 50% sustained utilization / 44.65 GFLOP/img =
175.8 images/sec — a bound GENEROUS to the reference (torch-eager SNGAN
at 32px with BN+spectral-norm overhead sustains well under 50%).
Measured CPU anchor: the reference's own step, run from /root/reference/src
on this host, does 2.37 img/s (1 torch thread).
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

# Persistent compile cache so repeat bench runs skip the large first-compile.
# Fenced: under the remote-compile axon backend the cache deadlocks the
# client (round-3 BENCH rc=124 — the bench hung forever while the identical
# program without the cache measured 5,069 img/s), so enable_compile_cache
# refuses there unless MCGM_COMPILE_CACHE=1 forces it.
enable_compile_cache("/tmp/mcgm_jax_cache")

# Watchdog: if setup+compile+warmup has not finished within this budget the
# backend is wedged (tunnel hangs are a demonstrated failure mode here) —
# print a parseable JSON line saying so and hard-exit instead of eating the
# driver's whole timeout silently.
WARMUP_BUDGET_SECS = float(os.environ.get("MCGM_BENCH_WATCHDOG_SECS", "480"))


def _arm_watchdog(budget: float) -> threading.Timer:
    def _trip():
        print(json.dumps({
            "metric": "mcgan_cifar10_train_images_per_sec_per_chip",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"watchdog: warmup exceeded {budget:.0f}s "
                     "(wedged backend/tunnel?)",
        }), flush=True)
        os._exit(3)

    t = threading.Timer(budget, _trip)
    t.daemon = True
    t.start()
    return t

# FLOPs-derived V100-fp32 upper bound for the torch reference on this exact
# model/protocol (batch 128, 5 D-steps + 1 G-step per batch) — derivation in
# tools/measure_torch_baseline.py and BASELINE.md. Biased in the reference's
# favor (50% sustained utilization).
BASELINE_IMAGES_PER_SEC = 175.8

BATCH = 128
STEPS = 30


def main():
    watchdog = _arm_watchdog(WARMUP_BUDGET_SECS)
    # bf16 activations/weights with f32 master params is the TPU-native
    # training configuration (measured: 3327 img/s vs 2782 f32 on v5e).
    # Set MCGM_FP32=1 for the full-precision variant.
    if os.environ.get("MCGM_FP32", "0") != "1":
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
    from mcgm_tpu.models.gan import MCGAN
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (GANTrainState, jit_init,
                                      make_gan_train_step, split_variables)

    model = MCGAN((32, 32, 3), 128, (256,) * 4, (128,) * 4, num_mode=10,
                  controller_rate=0.5, cifar_style=True)
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jax.random.uniform(rng, (BATCH, 32, 32, 3), minval=-1, maxval=1),
        "label": jnp.arange(BATCH, dtype=jnp.int32) % 10,
    }
    # jitted CPU init: one compiled program (disk-cached across runs)
    init_batch = {"img": batch["img"][:2], "label": batch["label"][:2]}
    variables = jit_init(model, {"params": rng, "z": rng}, init_batch, train=True)
    variables = jax.device_put(variables, jax.devices()[0])
    params, state = split_variables(variables)
    cfg = {"optimizer_name": "Adam", "lr": 2e-4, "weight_decay": 0}
    g_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    d_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    ts = GANTrainState(
        g_params=params["generator"], d_params=params["discriminator"],
        state=state,
        g_opt_state=g_opt.init(params["generator"]),
        d_opt_state=d_opt.init(params["discriminator"]),
        rng=jax.random.PRNGKey(1),
    )
    unroll = int(os.environ.get("MCGM_UNROLL", "1"))
    base_step = make_gan_train_step(model, g_opt, d_opt, d_iter=5,
                                    unroll=unroll)
    # MCGM_K > 1: the production multi-step dispatch (train/state.py
    # make_multi_train_step) — k steps fused into one program, amortizing
    # per-dispatch tunnel latency exactly as cfg['steps_per_dispatch'] does.
    k = int(os.environ.get("MCGM_K", "1"))
    if k < 1:
        raise ValueError(f"MCGM_K must be >= 1, got {k}")
    if k > 1:
        from mcgm_tpu.train.state import make_multi_train_step

        step = jax.jit(make_multi_train_step(base_step, k), donate_argnums=0)
        batch = jax.tree_util.tree_map(
            lambda l: jnp.broadcast_to(l, (k,) + l.shape), batch)
    else:
        step = jax.jit(base_step, donate_argnums=0)
    n_disp = max(STEPS // k, 1)
    # compile + warmup (first executions may trigger a second donated-layout
    # compile and persistent-cache serialization)
    for _ in range(3):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    watchdog.cancel()  # compile+warmup done; the timed region is bounded
    t0 = time.perf_counter()
    for _ in range(n_disp):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    images_per_sec = BATCH * n_disp * k / dt
    print(json.dumps({
        "metric": "mcgan_cifar10_train_images_per_sec_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
