"""Conditional convolutional VAEs: CVAE (class embeddings) and MCVAE
(MultimodalController gating).

Behavioral port of reference src/models/cvae.py and src/models/mcvae.py:
images arrive in [-1, 1], are mapped to [0, 1] inside forward, loss is
(BCE_sum + KLD) / numel, eval mode uses z = mu, and ``generate`` maps decoder
output back to [-1, 1]. Architecture: stride-2 conv encoder (3 stages at
32 px) + 2 residual blocks, linear mu/logvar heads to a 128-d latent, and the
mirrored transposed-conv decoder ending in a sigmoid. NHWC layout.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.controller import MultimodalController, one_hot
from ..ops.layers import BatchNorm, Conv, ConvTranspose, Dense


def binary_cross_entropy(p, t):
    """Elementwise BCE with torch-style clamping of log terms at -100."""
    p = p.astype(jnp.float32)
    t = t.astype(jnp.float32)
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 1e-44)), -100.0)
    log1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 1e-44)), -100.0)
    return -(t * logp + (1.0 - t) * log1p)


def vae_loss(x01, recon, mu, logvar, w=None):
    """(BCE_sum + KLD) / numel (reference src/models/mcvae.py:10-14).

    ``w`` [B]: optional validity mask (SPMD eval padding) — masked rows drop
    out of both sums and the numel denominator counts only valid rows.
    """
    b = x01.shape[0]
    bce_i = jnp.sum(binary_cross_entropy(recon, x01).reshape(b, -1), axis=1)
    kld_i = 0.5 * jnp.sum(
        (mu**2 + jnp.exp(logvar) - 1.0 - logvar).reshape(b, -1), axis=1)
    per = bce_i + kld_i
    if w is None:
        return jnp.sum(per) / x01.size
    w = w.astype(per.dtype)
    return jnp.sum(per * w) / (jnp.maximum(jnp.sum(w), 1.0) * (x01.size // b))


class MCResBlock(nn.Module):
    """conv-BN-ReLU-MC-conv-BN-MC residual block (reference mcvae.py:17-35)."""

    hidden_size: int
    num_mode: int
    controller_rate: float

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        h = Conv(self.hidden_size, 3, 1, 1)(x)
        h = BatchNorm()(h, use_running_average=not train)
        h = nn.relu(h)
        h = MultimodalController(self.hidden_size, self.num_mode, self.controller_rate)(h, indicator)
        h = Conv(self.hidden_size, 3, 1, 1)(h)
        h = BatchNorm()(h, use_running_average=not train)
        h = MultimodalController(self.hidden_size, self.num_mode, self.controller_rate)(h, indicator)
        return nn.relu(h + x)


class ResBlock(nn.Module):
    """Plain residual block (reference cvae.py:17-32, vqvae.py:10-24)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = Conv(self.hidden_size, 3, 1, 1)(x)
        h = BatchNorm()(h, use_running_average=not train)
        h = nn.relu(h)
        h = Conv(self.hidden_size, 3, 1, 1)(h)
        h = BatchNorm()(h, use_running_average=not train)
        return nn.relu(h + x)


class _MCEncoder(nn.Module):
    hidden_size: tuple
    latent_size: int
    num_res_block: int
    num_mode: int
    controller_rate: float

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        for h in self.hidden_size:
            x = Conv(h, 4, 2, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
            x = MultimodalController(h, self.num_mode, self.controller_rate)(x, indicator)
        for _ in range(self.num_res_block):
            x = MCResBlock(self.hidden_size[-1], self.num_mode, self.controller_rate)(
                x, indicator, train
            )
        x = x.reshape(x.shape[0], -1)
        mu = Dense(self.latent_size, name="mu")(x)
        logvar = Dense(self.latent_size, name="logvar")(x)
        return mu, logvar


class _MCDecoder(nn.Module):
    data_shape: tuple
    hidden_size: tuple
    latent_size: int
    num_res_block: int
    num_mode: int
    controller_rate: float

    @nn.compact
    def __call__(self, z, indicator, train: bool):
        hs = self.hidden_size
        H = self.data_shape[0] // (2 ** len(hs))
        encoded_shape = (H, H, hs[-1])
        z = MultimodalController(self.latent_size, self.num_mode, self.controller_rate)(z, indicator)
        x = Dense(int(np.prod(encoded_shape)))(z)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], *encoded_shape)
        x = MultimodalController(hs[-1], self.num_mode, self.controller_rate)(x, indicator)
        for _ in range(self.num_res_block):
            x = MCResBlock(hs[-1], self.num_mode, self.controller_rate)(x, indicator, train)
        for i in range(len(hs) - 1, 0, -1):
            x = ConvTranspose(hs[i - 1], 4, 2, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
            x = MultimodalController(hs[i - 1], self.num_mode, self.controller_rate)(x, indicator)
        x = ConvTranspose(self.data_shape[-1], 4, 2, 1)(x)
        return nn.sigmoid(x)


class _CEncoder(nn.Module):
    hidden_size: tuple
    latent_size: int
    num_res_block: int
    embedding_size: int

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        emb = Dense(self.embedding_size, use_bias=False, name="embedding")(indicator)
        emb = jnp.broadcast_to(
            emb[:, None, None, :], (x.shape[0], x.shape[1], x.shape[2], emb.shape[-1])
        )
        x = jnp.concatenate([x, emb], axis=-1)
        for h in self.hidden_size:
            x = Conv(h, 4, 2, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        for _ in range(self.num_res_block):
            x = ResBlock(self.hidden_size[-1])(x, train)
        x = x.reshape(x.shape[0], -1)
        mu = Dense(self.latent_size, name="mu")(x)
        logvar = Dense(self.latent_size, name="logvar")(x)
        return mu, logvar


class _CDecoder(nn.Module):
    data_shape: tuple
    hidden_size: tuple
    latent_size: int
    num_res_block: int
    embedding_size: int

    @nn.compact
    def __call__(self, z, indicator, train: bool):
        hs = self.hidden_size
        H = self.data_shape[0] // (2 ** len(hs))
        encoded_shape = (H, H, hs[-1])
        emb = Dense(self.embedding_size, use_bias=False, name="embedding")(indicator)
        x = jnp.concatenate([z, emb], axis=-1)
        x = Dense(int(np.prod(encoded_shape)))(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], *encoded_shape)
        for _ in range(self.num_res_block):
            x = ResBlock(hs[-1])(x, train)
        for i in range(len(hs) - 1, 0, -1):
            x = ConvTranspose(hs[i - 1], 4, 2, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        x = ConvTranspose(self.data_shape[-1], 4, 2, 1)(x)
        return nn.sigmoid(x)


class _VAEBase(nn.Module):
    def __call__(self, batch, train: bool = False):
        x01 = (batch["img"] + 1.0) / 2.0
        indicator = one_hot(batch["label"], self.num_mode)
        mu, logvar = self.encoder(x01, indicator, train)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), mu.shape, mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z = mu
        recon = self.decoder(z, indicator, train)
        loss = vae_loss(x01, recon, mu, logvar, batch.get("w"))
        return {"loss": loss, "img": recon * 2.0 - 1.0, "mu": mu, "logvar": logvar}

    def encode(self, x01, indicator, train: bool = False):
        return self.encoder(x01, indicator, train)

    def decode(self, z, indicator, train: bool = False):
        return self.decoder(z, indicator, train)

    def generate(self, C, z=None):
        if z is None:
            z = jax.random.normal(self.make_rng("z"), (C.shape[0], self.latent_size))
        indicator = one_hot(C, self.num_mode)
        x = self.decoder(z, indicator, train=False)
        return x * 2.0 - 1.0


class MCVAE(_VAEBase):
    data_shape: tuple = (32, 32, 3)  # HWC
    hidden_size: tuple = (64, 128, 256)
    latent_size: int = 128
    num_res_block: int = 2
    num_mode: int = 10
    controller_rate: float = 0.5

    def setup(self):
        self.encoder = _MCEncoder(
            self.hidden_size, self.latent_size, self.num_res_block,
            self.num_mode, self.controller_rate,
        )
        self.decoder = _MCDecoder(
            self.data_shape, self.hidden_size, self.latent_size,
            self.num_res_block, self.num_mode, self.controller_rate,
        )


class CVAE(_VAEBase):
    """Embedding-conditioned baseline (reference src/models/cvae.py).

    The class embedding (a bias-free linear on the one-hot indicator) is
    tiled as extra input channels for the encoder and concatenated to z for
    the decoder.
    """

    data_shape: tuple = (32, 32, 3)
    hidden_size: tuple = (64, 128, 256)
    latent_size: int = 128
    num_res_block: int = 2
    num_mode: int = 10
    embedding_size: int = 32

    def setup(self):
        self.encoder = _CEncoder(
            self.hidden_size, self.latent_size, self.num_res_block, self.embedding_size
        )
        self.decoder = _CDecoder(
            self.data_shape, self.hidden_size, self.latent_size,
            self.num_res_block, self.embedding_size,
        )
