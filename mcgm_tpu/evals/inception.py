"""InceptionV3 (torchvision architecture) in flax, for IS/FID parity.

The reference scores natural-image datasets with torchvision's pretrained
``inception_v3(transform_input=False)`` — logits for IS, the 2048-d pool3
features for FID — after bilinear upsampling inputs to 299
(reference src/metrics/metrics.py:63-73, 110-123). This module reimplements
that exact architecture in flax/NHWC with a mechanical converter from the
torchvision state dict, so converted weights reproduce the reference feature
space bit-for-bit (up to conv algorithm rounding).

Weights: run ``tools/convert_inception.py`` on a machine with the torchvision
checkpoint to produce ``output/inception/inception_v3.pkl``.
"""

from __future__ import annotations

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel_size: tuple
    strides: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        ph, pw = self.padding
        x = nn.Conv(self.features, (kh, kw), (self.strides, self.strides),
                    padding=[(ph, ph), (pw, pw)], use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=0.001,
                         name="bn")(x)
        return nn.relu(x)


def _avgpool3(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Feature trunk + classifier head (aux logits omitted — eval only)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        features = jnp.mean(x, axis=(1, 2))  # adaptive avg pool → [B, 2048]
        logits = nn.Dense(1000, name="fc")(features)
        return features, logits


def convert_torch_state_dict(sd: dict) -> dict:
    """torchvision inception_v3 state_dict (numpy arrays) → flax variables."""
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in sd.items():
        if key.startswith("AuxLogits"):
            continue
        parts = key.split(".")
        val = np.asarray(val)
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], val.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], val)
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], val)
            elif name == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], val)
            elif name == "running_var":
                put(batch_stats, parts[:-1] + ["var"], val)
        elif parts[0] == "fc":
            if parts[-1] == "weight":
                put(params, ["fc", "kernel"], val.T)
            else:
                put(params, ["fc", "bias"], val)
    return {"params": params, "batch_stats": batch_stats}


def bilinear_resize_299(x: jax.Array) -> jax.Array:
    """Bilinear upsample to 299x299, align_corners=False (reference
    metrics.py:66: nn.Upsample(mode='bilinear', align_corners=False))."""
    return jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                            method="bilinear")


def inception_feature_fn(weights_path: str):
    """``img[-1,1] NHWC -> (pool3_features, softmax_probs)``."""
    with open(weights_path, "rb") as f:
        variables = pickle.load(f)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    model = InceptionV3()

    @jax.jit
    def fn(img):
        if img.shape[-1] == 1:
            img = jnp.repeat(img, 3, axis=-1)
        x = bilinear_resize_299(img.astype(jnp.float32))
        feats, logits = model.apply(variables, x)
        return feats, jax.nn.softmax(logits, axis=-1)

    return fn
