"""VQ-VAE: unconditional autoencoder over a discrete 8x8 code grid.

Behavioral port of reference src/models/vqvae.py: two stride-2 conv stages
(hidden [128, 128]), two residual blocks, a 1x1-ish conv to the 64-d embedding
space, EMA vector quantization with 512 codes, and the mirrored decoder ending
in tanh. Loss = MSE(recon, img) + 0.25 * commitment. ``decode_code`` is the
PixelCNN sampling backend (reference vqvae.py:92-95).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from ..ops.layers import BatchNorm, Conv, ConvTranspose, weighted_mean
from ..ops.vq import VectorQuantizerEMA
from .vae import ResBlock


class _Encoder(nn.Module):
    hidden_size: tuple
    num_res_block: int
    embedding_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        hs = self.hidden_size
        x = Conv(hs[0], 4, 2, 1)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        for i in range(len(hs) - 1):
            x = Conv(hs[i + 1], 4, 2, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        for _ in range(self.num_res_block):
            x = ResBlock(hs[-1])(x, train)
        return Conv(self.embedding_size, 3, 1, 1)(x)


class _Decoder(nn.Module):
    data_shape: tuple
    hidden_size: tuple
    num_res_block: int

    @nn.compact
    def __call__(self, x, train: bool):
        hs = self.hidden_size
        x = Conv(hs[-1], 3, 1, 1)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        for _ in range(self.num_res_block):
            x = ResBlock(hs[-1])(x, train)
        for i in range(len(hs) - 1, 0, -1):
            x = ConvTranspose(hs[i - 1], 4, 2, 1)(x)
            x = BatchNorm()(x, use_running_average=not train)
            x = nn.relu(x)
        x = ConvTranspose(self.data_shape[-1], 4, 2, 1)(x)
        return nn.tanh(x)


class VQVAE(nn.Module):
    data_shape: tuple = (32, 32, 3)
    hidden_size: tuple = (128, 128)
    num_res_block: int = 2
    embedding_size: int = 64
    num_embedding: int = 512
    vq_commit: float = 0.25

    def setup(self):
        self.encoder = _Encoder(self.hidden_size, self.num_res_block, self.embedding_size)
        self.quantizer = VectorQuantizerEMA(self.embedding_size, self.num_embedding)
        self.decoder = _Decoder(self.data_shape, self.hidden_size, self.num_res_block)

    def encode(self, x, train: bool = False, w=None):
        h = self.encoder(x, train)
        quantized, vq_diff, code = self.quantizer(h, train=train, w=w)
        return quantized, vq_diff, code

    def decode(self, quantized, train: bool = False):
        return self.decoder(quantized, train)

    def decode_code(self, code, train: bool = False):
        quantized = self.quantizer.embedding_code(code)
        return self.decoder(quantized, train)

    def __call__(self, batch, train: bool = False):
        x = batch["img"]
        w = batch.get("w")  # SPMD eval padding mask (exact eval)
        quantized, vq_diff, code = self.encode(x, train, w=w)
        recon = self.decode(quantized, train)
        mse = weighted_mean(
            (recon.astype(jnp.float32) - x.astype(jnp.float32)) ** 2, w)
        loss = mse + self.vq_commit * vq_diff
        return {"loss": loss, "img": recon, "code": code}
