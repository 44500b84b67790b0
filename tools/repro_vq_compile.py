#!/usr/bin/env python
"""Isolate the vqvae seed-parallel compile pathology (DESIGN.md: S=12 k=8
>35 min XLA compile; S=8 compiles in seconds).

Jits a minimal program containing ONLY the suspect op chain — the vmapped
VQ-EMA update (argmin -> one_hot -> counts/sums matmul -> codebook gather)
at production CIFAR10 vqvae shapes (N=128*8*8 positions, D=64, K=512) —
and times compile for each S, optionally wrapped in the k-step scan the
production dispatch uses.  ``--impl`` selects alternative formulations so
the fix can be chosen by measurement.

Usage: python tools/repro_vq_compile.py --seeds 8,12 --k 8 --impl onehot
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, D, K = 128 * 8 * 8, 64, 512
DECAY, EPS = 0.99, 1e-5


def vq_step(state, x, impl):
    emb, cluster, mean = state
    flat = x.reshape(-1, D).astype(jnp.float32)
    dist = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        - 2.0 * flat @ emb
        + jnp.sum(emb**2, axis=0, keepdims=True)
    )
    ind = jnp.argmin(dist, axis=1)
    if impl == "onehot":
        oh = jax.nn.one_hot(ind, K, dtype=flat.dtype)
        counts = oh.sum(0)
        emb_sum = flat.T @ oh
    elif impl == "segment":
        counts = jax.ops.segment_sum(jnp.ones_like(ind, flat.dtype), ind, K)
        emb_sum = jax.ops.segment_sum(flat, ind, K).T
    elif impl == "onehot_bf16":
        oh = jax.nn.one_hot(ind, K, dtype=jnp.bfloat16)
        counts = oh.astype(jnp.float32).sum(0)
        emb_sum = (flat.astype(jnp.bfloat16).T @ oh).astype(jnp.float32)
    else:
        raise SystemExit(f"unknown --impl {impl}")
    new_cluster = cluster * DECAY + counts * (1 - DECAY)
    new_mean = mean * DECAY + emb_sum * (1 - DECAY)
    n = new_cluster.sum()
    smoothed = (new_cluster + EPS) / (n + K * EPS) * n
    new_emb = new_mean / smoothed[None, :]
    # codebook gather (decode path)
    q = jnp.take(new_emb.T, ind, axis=0)
    loss = jnp.mean((q - flat) ** 2)
    return (new_emb, new_cluster, new_mean), loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="8,12")
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--impl", default="onehot")
    ap.add_argument("--grad", action="store_true",
                    help="differentiate w.r.t. x (production steps do)")
    args = ap.parse_args()

    for S in [int(s) for s in args.seeds.split(",")]:
        def one(state, x):
            if args.grad:
                def loss_fn(xx):
                    st, l = vq_step(state, xx, args.impl)
                    return l, st
                (l, st), g = jax.value_and_grad(loss_fn, has_aux=True)(x)
                return st, l + jnp.sum(g) * 0.0
            return vq_step(state, x, args.impl)

        body = jax.vmap(one)

        def kstep(state, xs):
            def sc(c, x):
                c2, l = body(c, x)
                return c2, l
            return jax.lax.scan(sc, state, xs)

        fn = kstep if args.k > 1 else (lambda s, xs: body(s, xs[0]))
        emb = jnp.zeros((S, D, K)) + 0.01
        state = (emb, jnp.zeros((S, K)), emb)
        xs = jnp.zeros((args.k, S, N, D), jnp.bfloat16) + 0.5  # [k, S, N, D]
        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(state, xs)
        c = lowered.compile()
        t1 = time.perf_counter()
        print(f"S={S:2d} k={args.k} impl={args.impl} grad={args.grad}: "
              f"compile {t1 - t0:7.2f}s", flush=True)
        del c


if __name__ == "__main__":
    main()
