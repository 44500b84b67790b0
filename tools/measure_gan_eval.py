#!/usr/bin/env python
"""Measure the per-epoch GAN eval wall time: fused on-device moments path
(train/loop.py::_gan_eval_moments) vs the round-2 host path (sync a full
image chunk to host per dispatch, re-upload for feature extraction).

Protocol shapes: CIFAR10 MCGAN, 10 classes x 1000 images, chunk 512,
classifier feature model (random weights — timing only). Writes
docs/artifacts/gan_eval_timing.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon


def main():
    from mcgm_tpu.evals.features import classifier_feature_fn
    from mcgm_tpu.evals.metrics import (batched_feature_probs,
                                        inception_score)
    from mcgm_tpu.models.classifier import Classifier
    from mcgm_tpu.models.gan import MCGAN
    from mcgm_tpu.ops.layers import set_compute_dtype
    from mcgm_tpu.train.state import jit_init, split_variables

    set_compute_dtype(jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    model = MCGAN((32, 32, 3), 128, (256,) * 4, (128,) * 4, num_mode=10,
                  controller_rate=0.5, cifar_style=True)
    batch = {"img": jnp.zeros((2, 32, 32, 3)), "label": jnp.zeros((2,), jnp.int32)}
    variables = jit_init(model, {"params": rng, "z": rng}, batch, train=True)
    variables = jax.device_put(variables, jax.devices()[0])

    cfg = {"data_shape": (32, 32, 3), "classes_size": 10,
           "classifier": {"hidden_size": [8, 16, 32, 64]}}
    clf = Classifier((32, 32, 3), (8, 16, 32, 64), 10)
    clf_vars = clf.init({"params": jax.random.PRNGKey(1)},
                        {"img": batch["img"]}, train=True)
    feature_fn = classifier_feature_fn(cfg, clf_vars)

    total, chunk = 10_000, 512
    C = np.tile(np.arange(10), 1000)
    z = jax.random.normal(jax.random.PRNGKey(2), (total, 128))

    gen = jax.jit(lambda v, Ci, zi: model.apply(v, Ci, zi, False,
                                                method="generate"))

    @partial(jax.jit, donate_argnums=(0, 1))
    def add_chunk(fsum, fouter, v, Ci, zi, center):
        # centered accumulation, same as Experiment._gan_eval_moments: raw
        # f32 second moments cancel catastrophically at feature scale where
        # |mu| >> sigma; accumulating around a fixed center stays O(sigma)
        img = model.apply(v, Ci, zi, False, method="generate")
        feats, probs = feature_fn(img)
        f = feats.astype(jnp.float32) - center
        return fsum + f.sum(0), fouter + f.T @ f, probs

    probe, _ = feature_fn(jnp.zeros((1, 32, 32, 3)))
    d = probe.shape[-1]
    first_img = gen(variables, jnp.asarray(C[:chunk], jnp.int32), z[:chunk])
    center = feature_fn(first_img)[0].astype(jnp.float32).mean(0)

    def fused():
        fsum = jnp.zeros((d,), jnp.float32)
        fouter = jnp.zeros((d, d), jnp.float32)
        parts = []
        for i in range(0, total, chunk):
            Ci = jnp.asarray(C[i:i + chunk], jnp.int32)
            fsum, fouter, p = add_chunk(fsum, fouter, variables, Ci,
                                        z[i:i + chunk], center)
            parts.append(p)
        probs = np.asarray(jnp.concatenate(parts))
        gbar = np.asarray(fsum, np.float64) / total
        mu = np.asarray(center, np.float64) + gbar
        sig = (np.asarray(fouter, np.float64)
               - total * np.outer(gbar, gbar)) / (total - 1)
        return inception_score(probs, 1), mu, sig

    def host_path():
        imgs = []
        for i in range(0, total, chunk):
            Ci = jnp.asarray(C[i:i + chunk], jnp.int32)
            imgs.append(np.asarray(gen(variables, Ci, z[i:i + chunk])))
        generated = np.concatenate(imgs)
        feats, probs = batched_feature_probs(feature_fn, generated)
        mu = feats.mean(0)
        sig = np.cov(feats, rowvar=False)
        return inception_score(probs, 1), mu, sig

    out = {}
    for name, fn in (("fused_on_device", fused), ("round2_host_path", host_path)):
        fn()  # compile warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            is_v, mu, sig = fn()
            times.append(time.perf_counter() - t0)
        out[name] = {"seconds_per_epoch_eval": round(min(times), 3),
                     "runs": [round(t, 3) for t in times]}
        print(name, out[name])
    out["config"] = {"images": total, "chunk": chunk, "feature_dim": int(d)}
    out["note"] = ("fused path: one jitted dispatch per chunk generates, "
                   "extracts features, accumulates moments on device; only "
                   "probs [N,10] and O(d^2) moments transfer. host path "
                   "(round 2): full image tensor to host per chunk + "
                   "re-upload for features.")
    path = os.path.join("docs", "artifacts", "gan_eval_timing.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
