#!/usr/bin/env python
"""Bisect the vqvae seed-parallel S=12 k>=2 compile pathology.

Builds the PRODUCTION vqvae step exactly like tools/bench_seed_parallel.py
(vmapped over S, k-step scan dispatch) but with one piece of the VQ op
replaced per ``--variant``, so the pathological construct can be identified
by which replacement makes the compile fast again. Run each variant under
``timeout``; completing the 3 warmup + 3 timed steps inside the bound
means "compiles fine".

Variants:
  full        production op (the known-slow baseline at S=12 k>=2)
  no_vq       whole VQ op bypassed (identity quantize, zero codes)
  no_ema      EMA buffer update skipped (forward math unchanged)
  no_argmin   dist matmul kept live, only the argmin replaced by zeros
  matmul_gather  decode gather via one_hot @ emb.T instead of jnp.take
  segment     EMA counts/sums via segment_sum instead of one_hot matmul
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import compile_cache_allowed

if compile_cache_allowed():  # fenced: off under remote-compile axon
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcgm_jax_cache_bisect")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10000.0)


def patch(variant):
    import mcgm_tpu.ops.vq as vq
    import mcgm_tpu.models.vqvae as mvq

    if variant == "full":
        return

    import flax.linen as nn
    from mcgm_tpu.ops.layers import weighted_mean

    def call(self, x, train=False, w=None):
        D, K = self.embedding_size, self.num_embedding
        if variant == "no_vq":
            x32 = x.astype(jnp.float32)
            code = jnp.zeros(x.shape[:-1], jnp.int32)
            return x, jnp.mean(x32**2) * 0.0, code
        embedding = self.variable(
            "vq_stats", "embedding",
            lambda: jax.random.normal(self.make_rng("params"), (D, K)))
        cluster_size = self.variable(
            "vq_stats", "cluster_size", lambda: jnp.zeros((K,)))
        embedding_mean = self.variable(
            "vq_stats", "embedding_mean", lambda: embedding.value)
        flat = x.reshape(-1, D).astype(jnp.float32)
        emb = embedding.value
        dist = (jnp.sum(flat**2, 1, keepdims=True) - 2.0 * flat @ emb
                + jnp.sum(emb**2, 0, keepdims=True))
        if variant == "no_argmin":
            # keep the dist matmul live so only the argmin is bisected out
            ind = jnp.zeros((flat.shape[0],), jnp.int32) + (
                0 * dist[:, 0]).astype(jnp.int32)
        else:
            ind = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(ind, K, dtype=flat.dtype)
        code = ind.reshape(x.shape[:-1])
        if variant == "matmul_gather":
            quantize = (onehot @ emb.T).reshape(x.shape[:-1] + (D,))
        else:
            quantize = self.embedding_code_from(emb, code)
        if train and self.is_mutable_collection("vq_stats") and variant != "no_ema":
            d = self.decay
            if variant == "segment":
                new_cluster = cluster_size.value * d + jax.ops.segment_sum(
                    jnp.ones_like(ind, flat.dtype), ind, K) * (1 - d)
                emb_sum = jax.ops.segment_sum(flat, ind, K).T
            else:
                new_cluster = cluster_size.value * d + onehot.sum(0) * (1 - d)
                emb_sum = flat.T @ onehot
            new_mean = embedding_mean.value * d + emb_sum * (1 - d)
            n = new_cluster.sum()
            smoothed = (new_cluster + self.eps) / (n + K * self.eps) * n
            cluster_size.value = new_cluster
            embedding_mean.value = new_mean
            embedding.value = new_mean / smoothed[None, :]
        x32 = x.astype(jnp.float32)
        sq = (jax.lax.stop_gradient(quantize) - x32) ** 2
        diff = weighted_mean(sq, w)
        quantize = x32 + jax.lax.stop_gradient(quantize - x32)
        return quantize.astype(x.dtype), diff, code

    class PatchedVQ(vq.VectorQuantizerEMA):
        __call__ = nn.compact(call)

    mvq.VectorQuantizerEMA = PatchedVQ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full",
                    choices=["full", "no_vq", "no_ema", "no_argmin",
                             "matmul_gather", "segment"])
    ap.add_argument("--seeds", type=int, default=12)
    ap.add_argument("--k", type=int, default=2)
    args = ap.parse_args()

    from mcgm_tpu.ops.layers import set_compute_dtype

    set_compute_dtype(jnp.bfloat16)
    patch(args.variant)

    from bench_seed_parallel import build

    t0 = time.perf_counter()
    step, ts, feed, bs = build("vqvae", args.k, args.seeds)
    for _ in range(3):
        ts, m = step(ts, feed)
    jax.block_until_ready(m)
    t1 = time.perf_counter()
    print(f"variant={args.variant} S={args.seeds} k={args.k}: "
          f"build+compile+3steps {t1 - t0:7.1f}s", flush=True)


if __name__ == "__main__":
    main()
