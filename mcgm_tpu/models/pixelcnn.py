"""Gated PixelCNN over VQ-VAE code grids: CPixelCNN (class-embedding bias) and
MCPixelCNN (MC gating).

Behavioral port of reference src/models/cpixelcnn.py and mcpixelcnn.py:
15 layers (layer 0 mask-A kernel 7, rest mask-B kernel 3) of vertical /
horizontal stacks with gate = ReLU(BN(x)) * sigmoid(y), residual on the
horizontal stack, and a 1x1-conv head to 512-way logits; loss is
cross-entropy over code indices.

TPU-first notes:

- causal masking is a constant multiplicative kernel mask (same math as the
  reference's re-zeroing of weights each forward at mcpixelcnn.py:43-49, but
  functional and fusion-friendly);
- padding is asymmetric (top / left only) so the valid conv directly yields
  the causal receptive field the reference obtains by symmetric padding plus
  output cropping — identical outputs, one less memory copy;
- the raster-scan sampler is a ``lax.fori_loop`` over the 64 positions
  (replacing the Python double loop at mcpixelcnn.py:107-111).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.controller import MultimodalController, one_hot
from ..ops.layers import BatchNorm, Conv


def _vert_mask(kernel: int, mask_type: str) -> np.ndarray:
    """Vertical-stack kernel mask, HWIO: rows cover [i-k//2, i]; mask A drops
    the current row (last kernel row)."""
    kh = kernel // 2 + 1
    m = np.ones((kh, kernel, 1, 1), np.float32)
    if mask_type == "A":
        m[-1, :, :, :] = 0.0
    return m


def _horiz_mask(kernel: int, mask_type: str) -> np.ndarray:
    """Horizontal-stack kernel mask: cols cover [j-k//2, j]; mask A drops the
    current column."""
    kw = kernel // 2 + 1
    m = np.ones((1, kw, 1, 1), np.float32)
    if mask_type == "A":
        m[:, -1, :, :] = 0.0
    return m


class _GatedActivation(nn.Module):
    """ReLU(BN(x)) * sigmoid(y), optionally MC-gated (reference mcpixelcnn.py:9-20)."""

    hidden_size: int
    num_mode: int | None
    controller_rate: float | None

    @nn.compact
    def __call__(self, xy, indicator, train: bool):
        x, y = jnp.split(xy, 2, axis=-1)
        x = BatchNorm()(x, use_running_average=not train)
        out = nn.relu(x) * nn.sigmoid(y)
        if self.num_mode is not None:
            out = MultimodalController(self.hidden_size, self.num_mode,
                                       self.controller_rate)(out, indicator)
        return out


class _GatedMaskedConv(nn.Module):
    """One vertical/horizontal gated layer (reference mcpixelcnn.py:23-60).

    ``conditional=True`` adds a per-class bias into both gates instead of MC
    (reference cpixelcnn.py:27, 49-56).
    """

    mask_type: str
    hidden_size: int
    kernel: int
    residual: bool
    num_mode: int | None = None
    controller_rate: float | None = None
    conditional: bool = False

    @nn.compact
    def __call__(self, x_v, x_h, indicator, train: bool):
        h, k = self.hidden_size, self.kernel
        mc_args = (None, None) if self.conditional else (self.num_mode, self.controller_rate)

        h_vert = Conv(2 * h, (k // 2 + 1, k), 1,
                      padding=[(k // 2, 0), (k // 2, k // 2)],
                      kernel_mask=_vert_mask(k, self.mask_type),
                      name="vert_stack")(x_v)
        h_horiz = Conv(2 * h, (1, k // 2 + 1), 1,
                       padding=[(0, 0), (k // 2, 0)],
                       kernel_mask=_horiz_mask(k, self.mask_type),
                       name="horiz_stack")(x_h)
        v2h = Conv(2 * h, 1, 1, 0, name="vert_to_horiz")(h_vert)

        cond_bias = 0.0
        if self.conditional:
            emb = nn.Embed(self.num_mode, 2 * h, name="class_cond_embedding")(
                jnp.argmax(indicator, axis=-1)
            )
            cond_bias = emb[:, None, None, :]

        out_v = _GatedActivation(h, *mc_args, name="gate_v")(
            h_vert + cond_bias, indicator, train
        )
        out_h = _GatedActivation(h, *mc_args, name="gate_h")(
            v2h + h_horiz + cond_bias, indicator, train
        )
        r = Conv(h, 1, 1, 0, name="horiz_resid_conv")(out_h)
        r = BatchNorm(name="horiz_resid_bn")(r, use_running_average=not train)
        if not self.conditional and self.num_mode is not None:
            r = MultimodalController(h, self.num_mode, self.controller_rate,
                                     name="horiz_resid_mc")(r, indicator)
        out_h = r + x_h if self.residual else r
        return out_v, out_h


class _PixelCNNBase(nn.Module):
    def __call__(self, batch, train: bool = False):
        x = batch["img"]  # [B, H, W] int codes
        indicator = one_hot(batch["label"], self.num_mode)
        emb = self.embedding(x)  # [B, H, W, hidden]
        x_v = x_h = emb
        for layer in self.layers:
            x_v, x_h = layer(x_v, x_h, indicator, train)
        logits = self.head(x_h, indicator, train)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, x[..., None], axis=-1)
        return {"loss": jnp.mean(nll), "logits": logits}

    def logits(self, batch, train: bool = False):
        return self(batch, train)["logits"]


class _Head(nn.Module):
    """1x1 head: conv-BN-ReLU-[MC]-conv (reference mcpixelcnn.py:81-87)."""

    input_size: int
    num_mode: int | None
    controller_rate: float | None

    @nn.compact
    def __call__(self, x, indicator, train: bool):
        x = Conv(512, 1, 1, 0)(x)
        x = BatchNorm()(x, use_running_average=not train)
        x = nn.relu(x)
        if self.num_mode is not None:
            x = MultimodalController(512, self.num_mode, self.controller_rate)(x, indicator)
        return Conv(self.input_size, 1, 1, 0)(x)


class MCPixelCNN(_PixelCNNBase):
    input_size: int = 512  # number of code embeddings / output classes
    hidden_size: int = 128
    num_layer: int = 15
    num_mode: int = 10
    controller_rate: float = 0.5

    def setup(self):
        self.embedding = nn.Embed(self.input_size, self.hidden_size)
        self.layers = [
            _GatedMaskedConv(
                "A" if i == 0 else "B",
                self.hidden_size,
                7 if i == 0 else 3,
                i > 0,
                self.num_mode,
                self.controller_rate,
                name=f"layer_{i}",
            )
            for i in range(self.num_layer)
        ]
        self.head = _Head(self.input_size, self.num_mode, self.controller_rate)


class CPixelCNN(_PixelCNNBase):
    input_size: int = 512
    hidden_size: int = 128
    num_layer: int = 15
    num_mode: int = 10

    def setup(self):
        self.embedding = nn.Embed(self.input_size, self.hidden_size)
        self.layers = [
            _GatedMaskedConv(
                "A" if i == 0 else "B",
                self.hidden_size,
                7 if i == 0 else 3,
                i > 0,
                num_mode=self.num_mode,
                conditional=True,
                name=f"layer_{i}",
            )
            for i in range(self.num_layer)
        ]
        self.head = _Head(self.input_size, None, None)


def sample_codes(apply_fn, variables, C, rng, grid_hw=(8, 8)):
    """Raster-scan sampling as a single fused ``lax.fori_loop``.

    Functional replacement for the reference's Python double loop
    (mcpixelcnn.py:103-112): one full forward per position, multinomial sample
    at (i, j), write back. ``apply_fn`` is ``model.apply`` (eval mode).
    """
    H, W = grid_hw
    B = C.shape[0]
    img0 = jnp.zeros((B, H, W), jnp.int32)

    def body(t, carry):
        img, rng = carry
        i, j = t // W, t % W
        out = apply_fn(variables, {"img": img, "label": C}, False)
        logits_ij = jax.lax.dynamic_slice(
            out["logits"], (0, i, j, 0), (B, 1, 1, out["logits"].shape[-1])
        )[:, 0, 0, :]
        rng, sub = jax.random.split(rng)
        sample = jax.random.categorical(sub, logits_ij, axis=-1)
        img = jax.lax.dynamic_update_slice(
            img, sample[:, None, None].astype(jnp.int32), (0, i, j)
        )
        return img, rng

    img, _ = jax.lax.fori_loop(0, H * W, body, (img0, rng))
    return img
