"""SNGAN-style conditional GANs: CGAN (class embeddings) and MCGAN
(MultimodalController gating).

Behavioral port of reference src/models/cgan.py and src/models/mcgan.py:

- Generator: linear to 4x4xh0, nearest-upsample residual blocks, final
  BN-ReLU-conv3x3-tanh.
- Discriminator: FirstDisResBlock (conv,conv,avgpool), DisResBlocks (CIFAR10
  variant keeps two stride-1 tail blocks), ReLU, global sum pooling, linear
  to 1. Every discriminator Linear/Conv is spectral-normalized (reference
  src/models/utils.py:17-21), with xavier-uniform kernels (init_param).
- MCGAN gates both conv and shortcut paths through shared mc_1/mc_2
  controllers; CGAN concatenates a class embedding to z (G) and tiles it as
  extra image channels (D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.controller import MultimodalController, one_hot
from ..ops.layers import (
    BatchNorm, Conv, ConvS2D, Dense, SNConv, SNConvPool, SNDense,
    UpsampledConv, add_upsampled_nearest, avg_pool, global_sum_pool,
    upsample_nearest, xavier_uniform,
)

_xconv = dict(kernel_init=xavier_uniform)
# Functionally-dead generator conv biases run bias-free: Conv_0's output
# feeds the SAME block's BatchNorm_1 directly (no bypass), and the LAST
# block's Conv_1/Conv_2 sum feeds the head BatchNorm directly — in both
# cases a per-channel bias is exactly cancelled by the normalization, so the
# reference trains a no-op parameter (torch Conv2d default bias). Dropping
# them removes dead bias-grad reduces from the hot fused step. NOT dead:
# Conv_1/Conv_2 of non-final blocks (the NEXT block's shortcut taps the raw
# block input before its BN, so those biases reach the output through
# conv-mixed paths). Imported torch checkpoints fold the dead biases into
# the following BN running_mean (io/torch_import.py) — exact in train and
# eval mode, and the equality is preserved under continued training.
_xconv_nb = dict(kernel_init=xavier_uniform, use_bias=False)


class _MCGenResBlock(nn.Module):
    """reference mcgan.py:9-45 — shared mc_1/mc_2 across conv and shortcut."""

    input_size: int
    output_size: int
    num_mode: int
    controller_rate: float
    stride: int = 2
    tail_bias_free: bool = False  # last block: Conv_1/Conv_2 -> head BN

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        mc_1 = MultimodalController(self.input_size, self.num_mode, self.controller_rate, name="mc_1")
        mc_2 = MultimodalController(self.output_size, self.num_mode, self.controller_rate, name="mc_2")
        h = BatchNorm()(x, use_running_average=not train)
        h = nn.relu(h)
        # MC gating is per-channel, so it commutes with nearest-upsample:
        # gate at LOW res and fuse the upsample into the conv (UpsampledConv,
        # 2.25x fewer MACs, no materialized 4x tensor). Exact rewrite of the
        # reference Upsample->mc->Conv pipeline (mcgan.py:14-19).
        if self.stride == 2:
            h = mc_1(h, indicator)
            h = UpsampledConv(self.output_size, name="Conv_0", **_xconv_nb)(h)
        else:
            if self.stride > 1:
                h = upsample_nearest(h, self.stride)
            h = mc_1(h, indicator)
            h = Conv(self.output_size, 3, 1, 1, name="Conv_0", **_xconv_nb)(h)
        h = BatchNorm()(h, use_running_average=not train)
        h = nn.relu(h)
        h = mc_2(h, indicator)
        conv1_kw = _xconv_nb if self.tail_bias_free else _xconv
        h = Conv(self.output_size, 3, 1, 1, name="Conv_1", **conv1_kw)(h)
        if self.stride > 1:
            # 1x1 conv and MC gate both commute with nearest-upsample:
            # compute at LOW res (4x fewer MACs) and fuse the upsample into
            # the residual add (no materialized 4x tensor).
            sc = mc_1(x, indicator)
            sc = Conv(self.output_size, 1, 1, 0, name="Conv_2", **conv1_kw)(sc)
            return add_upsampled_nearest(h, sc, self.stride)
        if self.input_size != self.output_size:
            sc = mc_1(x, indicator)
            sc = Conv(self.output_size, 1, 1, 0, name="Conv_2", **conv1_kw)(sc)
        else:
            sc = x
        return h + sc


class _CGenResBlock(nn.Module):
    """reference cgan.py:8-36."""

    input_size: int
    output_size: int
    stride: int = 2
    tail_bias_free: bool = False  # last block: Conv_1/Conv_2 -> head BN

    @nn.compact
    def __call__(self, x, train: bool):
        h = BatchNorm()(x, use_running_average=not train)
        h = nn.relu(h)
        if self.stride == 2:
            h = UpsampledConv(self.output_size, name="Conv_0", **_xconv_nb)(h)
        else:
            if self.stride > 1:
                h = upsample_nearest(h, self.stride)
            h = Conv(self.output_size, 3, 1, 1, name="Conv_0", **_xconv_nb)(h)
        h = BatchNorm()(h, use_running_average=not train)
        h = nn.relu(h)
        conv1_kw = _xconv_nb if self.tail_bias_free else _xconv
        h = Conv(self.output_size, 3, 1, 1, name="Conv_1", **conv1_kw)(h)
        if self.stride > 1:
            sc = Conv(self.output_size, 1, 1, 0, name="Conv_2", **conv1_kw)(x)
            return add_upsampled_nearest(h, sc, self.stride)
        if self.input_size != self.output_size:
            sc = Conv(self.output_size, 1, 1, 0, name="Conv_2", **conv1_kw)(x)
        else:
            sc = x
        return h + sc


class MCGenerator(nn.Module):
    data_shape: tuple
    latent_size: int
    hidden_size: tuple
    num_mode: int
    controller_rate: float

    @nn.compact
    def __call__(self, z, indicator, train: bool = False):
        hs = self.hidden_size
        # Start resolution derived from data_shape: res / 2^(num blocks).
        # At 32px this is the reference's hardcoded 4x4 (mcgan.py:51,67); at
        # 128px the reference's 5-entry hidden list yields only 4 stride-2
        # blocks and emits 64x64 against 128x128 reals (latent defect masked
        # by its separate D(real)/D(fake) calls) — deriving the start keeps
        # G(z) shaped like the data. See docs/DESIGN.md (deviations).
        start = self.data_shape[0] >> (len(hs) - 1)
        x = Dense(hs[0] * start * start, kernel_init=xavier_uniform)(z)
        x = x.reshape(x.shape[0], start, start, hs[0])
        for i in range(len(hs) - 1):
            x = _MCGenResBlock(hs[i], hs[i + 1], self.num_mode,
                               self.controller_rate, 2,
                               tail_bias_free=(i == len(hs) - 2))(
                x, indicator, train
            )
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = MultimodalController(hs[-1], self.num_mode, self.controller_rate)(x, indicator)
        # space-to-depth lowering for the 3-channel head: same 3x3 conv
        # math, ~4x better MXU lane use (see ops.layers.ConvS2D)
        x = ConvS2D(self.data_shape[-1], name="Conv_0", **_xconv)(x)
        return nn.tanh(x)


class CGenerator(nn.Module):
    data_shape: tuple
    latent_size: int
    hidden_size: tuple
    num_mode: int
    embedding_size: int

    @nn.compact
    def __call__(self, z, indicator, train: bool = False):
        hs = self.hidden_size
        emb = Dense(self.embedding_size, use_bias=False, name="embedding",
                    kernel_init=xavier_uniform)(indicator)
        x = jnp.concatenate([z, emb], axis=-1)
        start = self.data_shape[0] >> (len(hs) - 1)  # see MCGenerator note
        x = Dense(hs[0] * start * start, kernel_init=xavier_uniform)(x)
        x = x.reshape(x.shape[0], start, start, hs[0])
        for i in range(len(hs) - 1):
            x = _CGenResBlock(hs[i], hs[i + 1], 2,
                              tail_bias_free=(i == len(hs) - 2))(x, train)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        x = ConvS2D(self.data_shape[-1], name="Conv_0", **_xconv)(x)
        return nn.tanh(x)


class _MCFirstDisResBlock(nn.Module):
    """reference mcgan.py:72-94 (spectral-normalized)."""

    output_size: int
    num_mode: int
    controller_rate: float

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        mc_1 = MultimodalController(self.output_size, self.num_mode, self.controller_rate, name="mc_1")
        h = SNConv(self.output_size, 3, 1, 1, name="SNConv_0")(x, update_stats=train)
        h = nn.relu(h)
        h = mc_1(h, indicator)
        # conv3x3 + avgpool folded into one stride-2 conv (2.25x fewer MACs);
        # the 1x1 shortcut commutes with avgpool so it runs at LOW res.
        h = SNConvPool(self.output_size, name="SNConv_1")(h, update_stats=train)
        sc = avg_pool(x, 2)
        sc = SNConv(self.output_size, 1, 1, 0, name="SNConv_2")(sc, update_stats=train)
        return h + sc


class _MCDisResBlock(nn.Module):
    """reference mcgan.py:97-137."""

    input_size: int
    output_size: int
    num_mode: int
    controller_rate: float
    stride: int

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        mc_1 = MultimodalController(self.input_size, self.num_mode, self.controller_rate, name="mc_1")
        mc_2 = MultimodalController(self.output_size, self.num_mode, self.controller_rate, name="mc_2")
        h = nn.relu(x)
        h = mc_1(h, indicator)
        h = SNConv(self.output_size, 3, 1, 1, name="SNConv_0")(h, update_stats=train)
        h = nn.relu(h)
        h = mc_2(h, indicator)
        if self.stride > 1:
            # fold the trailing avgpool into the conv; the shortcut's MC gate
            # and 1x1 conv both commute with avgpool -> pool first (4x less).
            h = SNConvPool(self.output_size, name="SNConv_1")(h, update_stats=train)
            sc = mc_1(avg_pool(x, 2), indicator)
            sc = SNConv(self.output_size, 1, 1, 0, name="SNConv_2")(sc, update_stats=train)
        else:
            h = SNConv(self.output_size, 3, 1, 1, name="SNConv_1")(h, update_stats=train)
            if self.input_size != self.output_size:
                sc = mc_1(x, indicator)
                sc = SNConv(self.output_size, 1, 1, 0, name="SNConv_2")(sc, update_stats=train)
            else:
                sc = x
        return h + sc


class _CFirstDisResBlock(nn.Module):
    output_size: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = SNConv(self.output_size, 3, 1, 1, name="SNConv_0")(x, update_stats=train)
        h = nn.relu(h)
        h = SNConvPool(self.output_size, name="SNConv_1")(h, update_stats=train)
        sc = avg_pool(x, 2)
        sc = SNConv(self.output_size, 1, 1, 0, name="SNConv_2")(sc, update_stats=train)
        return h + sc


class _CDisResBlock(nn.Module):
    input_size: int
    output_size: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.relu(x)
        h = SNConv(self.output_size, 3, 1, 1, name="SNConv_0")(h, update_stats=train)
        h = nn.relu(h)
        if self.stride > 1:
            h = SNConvPool(self.output_size, name="SNConv_1")(h, update_stats=train)
            sc = avg_pool(x, 2)
            sc = SNConv(self.output_size, 1, 1, 0, name="SNConv_2")(sc, update_stats=train)
        else:
            h = SNConv(self.output_size, 3, 1, 1, name="SNConv_1")(h, update_stats=train)
            if self.input_size != self.output_size:
                sc = SNConv(self.output_size, 1, 1, 0, name="SNConv_2")(x, update_stats=train)
            else:
                sc = x
        return h + sc


class MCDiscriminator(nn.Module):
    data_shape: tuple
    hidden_size: tuple
    num_mode: int
    controller_rate: float
    cifar_style: bool = False  # two stride-1 tail blocks (reference mcgan.py:154-176)

    @nn.compact
    def __call__(self, x, indicator, train: bool = False):
        hs = self.hidden_size
        x = _MCFirstDisResBlock(hs[0], self.num_mode, self.controller_rate)(x, indicator, train)
        n_tail = 2 if self.cifar_style else 1
        for i in range(len(hs) - 1 - n_tail):
            x = _MCDisResBlock(hs[i], hs[i + 1], self.num_mode, self.controller_rate, 2)(
                x, indicator, train
            )
        for i in range(len(hs) - 1 - n_tail, len(hs) - 1):
            x = _MCDisResBlock(hs[i], hs[i + 1], self.num_mode, self.controller_rate, 1)(
                x, indicator, train
            )
        x = nn.relu(x)
        x = MultimodalController(hs[-1], self.num_mode, self.controller_rate)(x, indicator)
        x = global_sum_pool(x)
        return SNDense(1)(x, update_stats=train)


class CDiscriminator(nn.Module):
    data_shape: tuple
    hidden_size: tuple
    num_mode: int
    embedding_size: int
    cifar_style: bool = False

    @nn.compact
    def __call__(self, x, indicator, train: bool = False):
        hs = self.hidden_size
        emb = SNDense(self.embedding_size, use_bias=False, name="embedding")(
            indicator, update_stats=train
        )
        emb = jnp.broadcast_to(
            emb[:, None, None, :], (x.shape[0], x.shape[1], x.shape[2], emb.shape[-1])
        )
        x = jnp.concatenate([x, emb], axis=-1)
        x = _CFirstDisResBlock(hs[0])(x, train)
        n_tail = 2 if self.cifar_style else 1
        for i in range(len(hs) - 1 - n_tail):
            x = _CDisResBlock(hs[i], hs[i + 1], 2)(x, train)
        for i in range(len(hs) - 1 - n_tail, len(hs) - 1):
            x = _CDisResBlock(hs[i], hs[i + 1], 1)(x, train)
        x = nn.relu(x)
        x = global_sum_pool(x)
        return SNDense(1)(x, update_stats=train)


class _GANBase(nn.Module):
    def generate(self, C, z=None, train: bool = False):
        if z is None:
            z = jax.random.normal(self.make_rng("z"), (C.shape[0], self.latent_size))
        indicator = one_hot(C, self.num_mode)
        return self.generator(z, indicator, train)

    def discriminate(self, x, C, train: bool = False):
        indicator = one_hot(C, self.num_mode)
        return self.discriminator(x, indicator, train)

    def __call__(self, batch, train: bool = False):
        """G→D chain (reference mcgan.py:205-209; used by summary only)."""
        z = jax.random.normal(
            self.make_rng("z"), (batch["img"].shape[0], self.latent_size)
        )
        x = self.generate(batch["label"], z, train)
        return self.discriminate(x, batch["label"], train)


class MCGAN(_GANBase):
    data_shape: tuple = (32, 32, 3)
    latent_size: int = 128
    generator_hidden_size: tuple = (256, 256, 256, 256)
    discriminator_hidden_size: tuple = (128, 128, 128, 128)
    num_mode: int = 10
    controller_rate: float = 0.5
    cifar_style: bool = False

    def setup(self):
        self.generator = MCGenerator(
            self.data_shape, self.latent_size, self.generator_hidden_size,
            self.num_mode, self.controller_rate,
        )
        self.discriminator = MCDiscriminator(
            self.data_shape, self.discriminator_hidden_size, self.num_mode,
            self.controller_rate, self.cifar_style,
        )


class CGAN(_GANBase):
    data_shape: tuple = (32, 32, 3)
    latent_size: int = 128
    generator_hidden_size: tuple = (256, 256, 256, 256)
    discriminator_hidden_size: tuple = (128, 128, 128, 128)
    num_mode: int = 10
    embedding_size: int = 32
    cifar_style: bool = False

    def setup(self):
        self.generator = CGenerator(
            self.data_shape, self.latent_size, self.generator_hidden_size,
            self.num_mode, self.embedding_size,
        )
        self.discriminator = CDiscriminator(
            self.data_shape, self.discriminator_hidden_size, self.num_mode,
            self.embedding_size, self.cifar_style,
        )
