"""Small CNN classifier.

Behavioral port of reference src/models/classifier.py: four conv3x3-BN-ReLU
stages with hidden [8, 16, 32, 64], max-pool after the first three, a linear
head, and cross-entropy loss. ``feature`` exposes the flattened penultimate
activations used as the IS/FID feature space for COIL100/Omniglot (reference
src/metrics/metrics.py:49-62).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.layers import BatchNorm, Conv, Dense, max_pool, weighted_mean


def cross_entropy(logits, labels, w=None):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    return weighted_mean(-jnp.take_along_axis(logp, labels[:, None], axis=1), w)


class Classifier(nn.Module):
    data_shape: tuple = (32, 32, 3)
    hidden_size: tuple = (8, 16, 32, 64)
    classes_size: int = 10

    @nn.compact
    def __call__(self, batch, train: bool = False, feature_only: bool = False):
        x = batch["img"] if isinstance(batch, dict) else batch
        hs = self.hidden_size
        for i, h in enumerate(hs):
            x = Conv(h, 3, 1, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
            if i < len(hs) - 1:
                x = max_pool(x, 2)
        x = x.reshape(x.shape[0], -1)
        if feature_only:
            return x
        logits = Dense(self.classes_size, name="classifier")(x)
        out = {"label": logits}
        if isinstance(batch, dict) and "label" in batch:
            out["loss"] = cross_entropy(logits, batch["label"], batch.get("w"))
        return out

    def feature(self, batch, train: bool = False):
        return self(batch, train=train, feature_only=True)
