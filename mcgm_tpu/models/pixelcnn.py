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
from ..ops.layers import BatchNorm, Conv, weighted_mean


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
        return {"loss": weighted_mean(nll, batch.get("w")), "logits": logits}

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


def sample_codes_incremental(model, variables, C, rng, grid_hw=(8, 8),
                             return_logits=False):
    """Cached-activation raster sampler (SURVEY §2.11 item 5, full form).

    ``sample_codes`` runs one FULL forward per position — H*W times the
    training-step FLOPs per sampled grid. This sampler exploits the stack
    structure instead:

    - the *vertical* stream at row ``i`` depends only on sampled rows
      ``< i`` (layer 0 is mask-A, which drops the current row; deeper
      mask-B layers only see the already-strictly-causal stream), so every
      layer's vertical row is computed ONCE per row, all columns at once;
    - the *horizontal* stream lives entirely within the current row, so per
      position only L tiny matmuls over cached left-neighbor windows run.

    Total work ≈ 2 full forwards per grid instead of H*W. Exactness: same
    per-position logits and identical samples for the same ``rng`` as
    ``sample_codes`` (asserted in tests/test_pixelcnn.py). The parameter
    math below mirrors Conv/BatchNorm(eval)/MultimodalController apply-time
    semantics; reference behavior at mcpixelcnn.py:103-112.
    """
    H, W = grid_hw
    B = C.shape[0]
    L = model.num_layer
    h = model.hidden_size
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    books = variables.get("codebook", {})
    conditional = "class_cond_embedding" in params["layer_0"]
    indicator = one_hot(C, model.num_mode)

    def bn_affine(scope_p, scope_s):
        w = scope_p["scale"] * jax.lax.rsqrt(scope_s["var"] + 1e-5)
        return w, scope_p["bias"] - scope_s["mean"] * w

    def code_of(book_scope):
        return indicator @ book_scope["codebook"]  # [B, features]

    # ---- precompute per-layer tensors (trace-time python loop; L static)
    lay = []
    for l in range(L):
        p = params[f"layer_{l}"]
        s = stats[f"layer_{l}"]
        b = books.get(f"layer_{l}", {})
        vk = p["vert_stack"]["kernel"]    # (kh, k, h, 2h)
        hk = p["horiz_stack"]["kernel"]   # (1, kw, h, 2h)
        if l == 0:  # mask A: drop current row / current column taps
            vk = vk[:-1]
            hk = hk[:, :-1]
        d = {
            "vk": vk, "vb": p["vert_stack"]["bias"],
            # horizontal window matmul form: (kw*h, 2h)
            "hk": hk[0].reshape(-1, hk.shape[-1]), "hb": p["horiz_stack"]["bias"],
            "v2k": p["vert_to_horiz"]["kernel"][0, 0],
            "v2b": p["vert_to_horiz"]["bias"],
            "rk": p["horiz_resid_conv"]["kernel"][0, 0],
            "rb": p["horiz_resid_conv"]["bias"],
        }
        d["gv_w"], d["gv_b"] = bn_affine(p["gate_v"]["BatchNorm_0"]["bn"],
                                         s["gate_v"]["BatchNorm_0"]["bn"])
        d["gh_w"], d["gh_b"] = bn_affine(p["gate_h"]["BatchNorm_0"]["bn"],
                                         s["gate_h"]["BatchNorm_0"]["bn"])
        d["r_w"], d["r_b"] = bn_affine(p["horiz_resid_bn"]["bn"],
                                       s["horiz_resid_bn"]["bn"])
        if conditional:
            emb = p["class_cond_embedding"]["embedding"]
            d["cond"] = emb[jnp.argmax(indicator, axis=-1)]  # [B, 2h]
        else:
            d["code_v"] = code_of(b["gate_v"]["MultimodalController_0"])
            d["code_h"] = code_of(b["gate_h"]["MultimodalController_0"])
            d["code_r"] = code_of(b["horiz_resid_mc"])
        lay.append(d)
    hp = params["head"]
    hs = stats["head"]
    head = {
        "k1": hp["Conv_0"]["kernel"][0, 0], "b1": hp["Conv_0"]["bias"],
        "k2": hp["Conv_1"]["kernel"][0, 0], "b2": hp["Conv_1"]["bias"],
    }
    head["w"], head["b"] = bn_affine(hp["BatchNorm_0"]["bn"],
                                     hs["BatchNorm_0"]["bn"])
    if "head" in books:
        head["code"] = code_of(books["head"]["MultimodalController_0"])
    emb_table = params["embedding"]["embedding"]  # [input_size, h]

    def gate(x2h, bn_w, bn_b, code):
        xg, yg = jnp.split(x2h, 2, axis=-1)
        out = nn.relu(xg * bn_w + bn_b) * nn.sigmoid(yg)
        return out if code is None else out * code.reshape(
            (B,) + (1,) * (out.ndim - 2) + (-1,))

    img0 = jnp.zeros((B, H, W), jnp.int32)
    # padded buffers: emb rows at +3 (layer-0 kernel reaches 3 rows up),
    # vertical-stream rows at +1 (mask-B kernel reaches 1 row up)
    emb_pad0 = jnp.zeros((B, H + 3, W, h), emb_table.dtype)
    outv0 = jnp.zeros((L, B, H + 1, W, h), emb_table.dtype)

    def row_body(i, carry):
        img, emb_pad, outv, rng, logits_acc = carry
        # ---------- vertical row phase: all layers, all columns of row i
        hvert_rows = []
        for l, d in enumerate(lay):
            if l == 0:
                x = jax.lax.dynamic_slice(emb_pad, (0, i, 0, 0), (B, 3, W, h))
                pw = 3
            else:
                x = jax.lax.dynamic_slice(outv[l - 1], (0, i, 0, 0),
                                          (B, 2, W, h))
                pw = 1
            y = jax.lax.conv_general_dilated(
                x, d["vk"], (1, 1), [(0, 0), (pw, pw)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            hv = y[:, 0] + d["vb"]  # [B, W, 2h]
            hvert_rows.append(hv)
            gin = hv + d["cond"][:, None, :] if conditional else hv
            ov = gate(gin, d["gv_w"], d["gv_b"], d.get("code_v"))
            outv = jax.lax.dynamic_update_slice(
                outv, ov[None, :, None], (l, 0, i + 1, 0, 0))

        # ---------- horizontal per-position phase
        # hrow[0] = embedding of the current row (cols fill as sampled);
        # hrow[l+1] = layer l's horizontal-stream output. Left-padded by 3.
        hrow0 = jnp.zeros((L + 1, B, W + 3, h), emb_table.dtype)

        def col_body(j, ccarry):
            img, emb_pad, hrow, rng, logits_acc = ccarry
            for l, d in enumerate(lay):
                if l == 0:  # mask A: cols j-3..j-1 (padded idx j..j+2)
                    win = jax.lax.dynamic_slice(hrow, (0, 0, j, 0),
                                                (1, B, 3, h))[0]
                else:       # mask B: cols j-1..j (padded idx j+2..j+3)
                    win = jax.lax.dynamic_slice(hrow, (l, 0, j + 2, 0),
                                                (1, B, 2, h))[0]
                hh = win.reshape(B, -1) @ d["hk"] + d["hb"]
                hv_j = jax.lax.dynamic_slice(
                    hvert_rows[l], (0, j, 0), (B, 1, hvert_rows[l].shape[-1])
                )[:, 0]
                v2h = hv_j @ d["v2k"] + d["v2b"]
                gin = v2h + hh
                if conditional:
                    gin = gin + d["cond"]
                oh = gate(gin, d["gh_w"], d["gh_b"], d.get("code_h"))
                r = oh @ d["rk"] + d["rb"]
                r = r * d["r_w"] + d["r_b"]
                if not conditional:
                    r = r * d["code_r"]
                if l > 0:  # residual on the horizontal stream
                    x_in = jax.lax.dynamic_slice(hrow, (l, 0, j + 3, 0),
                                                 (1, B, 1, h))[0, :, 0]
                    r = r + x_in
                hrow = jax.lax.dynamic_update_slice(
                    hrow, r[None, :, None], (l + 1, 0, j + 3, 0))

            feat = jax.lax.dynamic_slice(hrow, (L, 0, j + 3, 0),
                                         (1, B, 1, h))[0, :, 0]
            z = feat @ head["k1"] + head["b1"]
            z = nn.relu(z * head["w"] + head["b"])
            if "code" in head:
                z = z * head["code"]
            logits = (z @ head["k2"] + head["b2"]).astype(jnp.float32)
            rng, sub = jax.random.split(rng)
            sample = jax.random.categorical(sub, logits, axis=-1)
            img = jax.lax.dynamic_update_slice(
                img, sample[:, None, None].astype(jnp.int32), (0, i, j))
            ev = emb_table[sample]  # [B, h]
            emb_pad = jax.lax.dynamic_update_slice(
                emb_pad, ev[:, None, None, :], (0, i + 3, j, 0))
            hrow = jax.lax.dynamic_update_slice(
                hrow, ev[None, :, None], (0, 0, j + 3, 0))
            if logits_acc is not None:
                logits_acc = jax.lax.dynamic_update_slice(
                    logits_acc, logits[:, None, None], (0, i, j, 0))
            return img, emb_pad, hrow, rng, logits_acc

        img, emb_pad, _, rng, logits_acc = jax.lax.fori_loop(
            0, W, col_body, (img, emb_pad, hrow0, rng, logits_acc))
        return img, emb_pad, outv, rng, logits_acc

    logits_acc0 = (jnp.zeros((B, H, W, head["k2"].shape[-1]), jnp.float32)
                   if return_logits else None)
    img, _, _, _, logits_acc = jax.lax.fori_loop(
        0, H, row_body, (img0, emb_pad0, outv0, rng, logits_acc0))
    return (img, logits_acc) if return_logits else img
