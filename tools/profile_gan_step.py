#!/usr/bin/env python
"""Capture a jax.profiler trace of the fused MCGAN train step on the TPU and
print the top device-time consumers.

Usage: python tools/profile_gan_step.py [--fp32] [--steps 10] [--outdir /tmp/mcgm_trace]

Parses the generated .trace.json.gz (perfetto/chrome trace) and aggregates
event durations on the device tracks so the hot ops are visible without
TensorBoard.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon


def build_step(px128: bool = False, remat: bool = False):
    from mcgm_tpu.models.gan import MCGAN
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (GANTrainState, jit_init,
                                      make_gan_train_step, split_variables)

    if px128:
        # the reference's high-res protocol (config.py:134-137: 5-stage G/D,
        # batch 32, 20 modes — CelebA-HQ/ImageNet)
        model = MCGAN((128, 128, 3), 128, (1024, 512, 256, 128, 64),
                      (64, 128, 256, 512, 1024), num_mode=20,
                      controller_rate=0.5, cifar_style=False)
        bs, res, modes = 32, 128, 20
    else:
        model = MCGAN((32, 32, 3), 128, (256,) * 4, (128,) * 4, num_mode=10,
                      controller_rate=0.5, cifar_style=True)
        bs, res, modes = 128, 32, 10
    rng = jax.random.PRNGKey(0)
    batch = {
        "img": jax.random.uniform(rng, (bs, res, res, 3), minval=-1, maxval=1),
        "label": jnp.arange(bs, dtype=jnp.int32) % modes,
    }
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
    step = jax.jit(make_gan_train_step(model, g_opt, d_opt, d_iter=5,
                                       remat=remat))
    return step, ts, batch


_SHAPE_RE = None


def _parse_hlo_bytes(hlo_text: str) -> dict:
    """name -> (output_bytes, operand_bytes) for every HLO instruction.

    Bytes are logical buffer sizes (dtype size x element count, tuples
    summed). Joined with trace device times this gives per-fusion effective
    HBM bandwidth — the diagnostic that localizes below-roofline fusions
    (an op at ~800 GB/s on v5e is bandwidth-optimal; one at 300 GB/s has
    layout padding / strided access / compute limiting it)."""
    import re

    global _SHAPE_RE
    if _SHAPE_RE is None:
        _SHAPE_RE = re.compile(
            r"(c128|c64|f64|f32|bf16|f16|f8e4m3fn|f8e5m2|s64|u64|s32|u32"
            r"|s16|u16|s8|u8|s4|u4|pred)\[([0-9,]*)\]")
    dsize = {"c128": 16, "c64": 8, "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
             "f8e4m3fn": 1, "f8e5m2": 1, "s64": 8, "u64": 8, "s32": 4,
             "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1, "s4": 1,
             "u4": 1, "pred": 1}

    def shape_bytes(s: str) -> int:
        tot = 0
        for dt, dims in _SHAPE_RE.findall(s):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            tot += n * dsize[dt]
        return tot

    head_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*")
    defs = {}
    for line in hlo_text.splitlines():
        m = head_re.match(line)
        if not m:
            continue
        name = m.group(1)
        rest = line[m.end():]
        # shape is either a balanced (tuple, ...) or one whitespace-free token
        if rest.startswith("("):
            depth, i = 0, 0
            for i, ch in enumerate(rest):
                depth += (ch == "(") - (ch == ")")
                if depth == 0:
                    break
            shape, tail = rest[:i + 1], rest[i + 1:]
        else:
            sp = rest.find(" ")
            shape, tail = (rest, "") if sp < 0 else (rest[:sp], rest[sp:])
        om = re.match(r"\s*([\w\-]+)\(", tail)
        opcode = om.group(1) if om else "?"
        # operand names: every %ref before any kind=/calls= attribute
        attr = re.search(r"(?:, )(?:kind|calls|custom_call_target|to_apply)=",
                         tail)
        opnd_zone = tail[:attr.start()] if attr else tail
        opnds = re.findall(r"%([\w.\-]+)", opnd_zone)
        defs[name] = (shape_bytes(shape), opcode, opnds)
    out = {}
    for name, (obytes, opcode, opnds) in defs.items():
        ib = sum(defs[o][0] for o in opnds if o in defs)
        out[name] = (obytes, ib)
    return out


def summarize_trace(outdir: str, top: int = 40,
                    hlo_bytes: dict | None = None):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace.json.gz found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device (TPU) process ids and op-level threads ("XLA Ops").
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name or "/device" in name.lower() or "Device" in name}
    if not dev_pids:
        dev_pids = set(pid_names)  # fall back: everything
    op_tids = {k for k, name in tid_names.items()
               if k[0] in dev_pids and "op" in name.lower()}
    dur_by_name = defaultdict(float)
    count_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        key = (e.get("pid"), e.get("tid"))
        if e.get("ph") == "X" and "dur" in e and (
                key in op_tids if op_tids else e.get("pid") in dev_pids):
            name = e.get("name", "?")
            dur_by_name[name] += e["dur"]
            count_by_name[name] += 1
            total += e["dur"]
    print(f"trace: {path}")
    print(f"device tracks: {[pid_names[p] for p in dev_pids]}")
    print(f"op threads: {[tid_names[t] for t in op_tids]}")
    if hlo_bytes:
        print(f"{'us_total':>12} {'pct':>6} {'count':>6} {'GB_tot':>8} {'GB/s':>7}  op")
    else:
        print(f"{'us_total':>12} {'pct':>6} {'count':>6}  op")
    for name, dur in sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]:
        if hlo_bytes:
            ob, ib = hlo_bytes.get(name, (0, 0))
            gb = (ob + ib) * count_by_name[name] / 1e9
            gbps = gb / (dur / 1e6) if dur else 0.0
            print(f"{dur:12.0f} {100*dur/total:6.2f} {count_by_name[name]:6d} "
                  f"{gb:8.2f} {gbps:7.0f}  {name[:100]}")
        else:
            print(f"{dur:12.0f} {100*dur/total:6.2f} {count_by_name[name]:6d}  {name[:110]}")
    print(f"{total:12.0f} 100.00         TOTAL(device)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--px128", action="store_true",
                    help="profile the 128px CelebA-HQ/ImageNet protocol step")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--outdir", default="/tmp/mcgm_trace")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize loss forwards in backprop "
                         "(jax.checkpoint) — trades recompute FLOPs for "
                         "residual HBM traffic; relevant at 128px where "
                         "the step is bandwidth-bound")
    ap.add_argument("--no-trace", action="store_true",
                    help="wall-time only, skip the profiler trace")
    ap.add_argument("--traffic", action="store_true",
                    help="join per-op trace time with HLO buffer bytes and "
                         "print effective GB/s per fusion")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    if args.summarize_only:
        if args.traffic:
            ap.error("--traffic needs the step's HLO; it cannot be "
                     "combined with --summarize-only (re-run without "
                     "--summarize-only to recapture with GB/s columns)")
        summarize_trace(args.outdir, args.top)
        return
    if args.traffic and args.no_trace:
        ap.error("--traffic joins HLO bytes with a profiler trace; "
                 "drop --no-trace")

    if not args.fp32:
        from mcgm_tpu.ops.layers import set_compute_dtype

        set_compute_dtype(jnp.bfloat16)
    step, ts, batch = build_step(px128=args.px128, remat=args.remat)
    hlo_bytes = None
    if args.traffic:
        hlo_bytes = _parse_hlo_bytes(
            step.lower(ts, batch).compile().as_text())
    for _ in range(3):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    import time

    bs = batch["label"].shape[0]
    t0 = time.perf_counter()
    for _ in range(args.steps):
        ts, m = step(ts, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / args.steps
    print(f"gan train step: {dt*1e3:.1f} ms, {bs/dt:.0f} img/s")
    if args.no_trace:
        return
    with jax.profiler.trace(args.outdir):
        for _ in range(args.steps):
            ts, m = step(ts, batch)
        jax.block_until_ready(m)
    summarize_trace(args.outdir, args.top, hlo_bytes=hlo_bytes)


if __name__ == "__main__":
    main()
