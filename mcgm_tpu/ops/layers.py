"""Shared NN building blocks with reference-matching conventions.

Channels-last (NHWC) everywhere — the TPU-native layout. Initializers follow
the reference's torch conventions (reference src/models/utils.py:7-14):

- conv / dense kernels: torch ``kaiming_uniform(a=sqrt(5))`` default, i.e.
  ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``; GAN models switch kernels to
  xavier-uniform;
- biases: torch default ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``;
- BatchNorm: scale ~ N(1, 0.02), bias 0.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

Dtype = Any

# torch nn.Conv2d / nn.Linear default kernel init: U(-sqrt(1/fan_in), +sqrt(1/fan_in))
torch_kernel_init = jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
xavier_uniform = jax.nn.initializers.xavier_uniform()

# Optional low-precision compute: when set (e.g. jnp.bfloat16), conv/matmul
# inputs are cast down and accumulated in float32 on the MXU. Parameters and
# optimizer state stay float32 (mixed-precision training). Set BEFORE tracing.
_COMPUTE_DTYPE = [None]


def set_compute_dtype(dtype):
    """None → full f32; jnp.bfloat16 → bf16 inputs with f32 accumulation."""
    _COMPUTE_DTYPE[0] = dtype


def resolve_compute_dtype(name: str | None):
    """Map a config string to a compute dtype.

    'auto' (the config.yml default) → bf16 on TPU backends, f32 elsewhere
    (CPU bf16 is emulated and slower, and the test suite's golden tolerances
    assume f32). Parameters and optimizer state are f32 either way — only
    conv/matmul operands are cast (mixed-precision training).
    """
    if name in (None, "auto"):
        return jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") else None
    if name in ("float32", "f32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"unknown compute_dtype {name!r}")


def _cast_compute(x, kernel):
    dt = _COMPUTE_DTYPE[0]
    if dt is None:
        return x, kernel
    return x.astype(dt), kernel.astype(dt)


# Int8 post-training-quantized SERVING path (never training): weights are
# quantized per-output-channel at trace time — under jax.export the trained
# weights are captured constants, so the quantize ops constant-fold on the
# serving host and the artifact runs s8xs8->s32 convs on the MXU at twice
# the bf16 rate. Three modes (int8_serving context manager):
#   'dynamic'   — per-EXAMPLE activation abs-max each call; no calibration,
#                 a request never depends on what it was co-batched with.
#                 Measured throughput-neutral at 32px: the quant chain's
#                 VPU work offsets the MXU gain.
#   'calibrate' — full-precision math, recording each layer's activation
#                 abs-max into a 'quant_stats' collection (mutable apply).
#   'static'    — activation scales read from the calibrated quant_stats
#                 (one scalar per layer, baked into the export): deletes
#                 the dynamic abs-max/rescale chain — measured +16% over
#                 bf16 at the CIFAR arch where dynamic was neutral — and
#                 makes the artifact bit-invariant to batch composition.
# One-shot decoder families (gan/vae generate) are the intended targets.
# The reference has no quantized-inference story.
_INT8_SERVING = [None]


class int8_serving:
    """Context manager: trace the enclosed apply/export in int8-PTQ mode.

    ``mode``: 'dynamic' (default), 'static', or 'calibrate'.
    """

    def __init__(self, mode: str = "dynamic"):
        if mode not in ("dynamic", "static", "calibrate"):
            raise ValueError(f"unknown int8 mode {mode!r}")
        self._mode = mode

    def __enter__(self):
        self._prev = _INT8_SERVING[0]
        _INT8_SERVING[0] = self._mode

    def __exit__(self, *exc):
        _INT8_SERVING[0] = self._prev
        return False


def _quantize_sym(t: jax.Array, axes: tuple, dtype=jnp.int8):
    """Symmetric linear quantization to int8 over ``axes`` (reduced out of
    the scale). Returns (q, scale) with t ≈ q * scale."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(t / scale), -127, 127).astype(dtype)
    return q, scale


def _int8_conv(x, kernel, run_conv):
    """``run_conv(qx, qw, preferred_element_type)`` in int8, rescaled to f32.

    Weight scales are per output channel (last kernel axis); activation
    scales are per EXAMPLE (abs-max over each sample's own elements) so the
    quantization of one request is invariant to batch composition — the
    symbolic-batch artifact returns the same pixels for the same (C, z)
    whether served alone or co-batched. Exact integer accumulation in int32
    (verified s8xs8->s32 on TPU and CPU), so the only error is the two
    rounding steps."""
    qw, wscale = _quantize_sym(kernel, axes=tuple(range(kernel.ndim - 1)))
    qx, xscale = _quantize_sym(x, axes=tuple(range(1, x.ndim)))
    y = run_conv(qx, qw, jnp.int32)
    # wscale broadcasts over the output-channel (last) axis; xscale keeps
    # its [B, 1, ...] keepdims shape and broadcasts over the batch axis.
    # _cast_out: keep the dequantized activation in the compute dtype —
    # leaving it f32 doubled the inter-layer bandwidth vs the bf16 artifact
    # and made the int8 export a throughput REGRESSION (round-4
    # serving_int8_ab_trained.json: 54.3k vs 69.0k samples/s)
    return _cast_out(y.astype(jnp.float32) * (wscale.reshape(-1) * xscale))


def _int8_apply(mod, x, kernel, run_conv):
    """Dispatch the active int8 mode for one conv/matmul site.

    ``mod`` is the flax module instance — the 'quant_stats' collection keys
    scales by module path automatically."""
    mode = _INT8_SERVING[0]
    if mode == "calibrate":
        amax_v = mod.variable("quant_stats", "act_amax",
                              lambda: jnp.zeros((), jnp.float32))
        amax_v.value = jnp.maximum(
            amax_v.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        xc, kc = _cast_compute(x, kernel)
        return _cast_out(run_conv(xc, kc, _pref()))
    if mode == "static":
        if not mod.has_variable("quant_stats", "act_amax"):
            raise ValueError(
                "int8 'static' needs calibrated activation scales — run "
                "io.export.calibrate_int8 first (module "
                f"{'/'.join(mod.scope.path)} has no quant_stats)")
        amax = mod.get_variable("quant_stats", "act_amax")
        scale = jnp.maximum(amax.astype(jnp.float32), 1e-8) / 127.0
        qx = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        qw, wscale = _quantize_sym(kernel,
                                   axes=tuple(range(kernel.ndim - 1)))
        y = run_conv(qx, qw, jnp.int32)
        return _cast_out(y.astype(jnp.float32) * (wscale.reshape(-1) * scale))
    return _int8_conv(x, kernel, run_conv)


def _pref():
    """preferred_element_type: explicit f32 accumulation in full precision;
    in bf16 mode let XLA use the native bf16 conv path (MXU still accumulates
    partial products in f32) — mixed-dtype transpose rules otherwise reject
    the backward pass."""
    return None if _COMPUTE_DTYPE[0] is not None else jnp.float32


def _cast_out(y):
    """Keep layer outputs in the compute dtype so backward cotangents match
    (f32 accumulation happens inside the op via preferred_element_type)."""
    dt = _COMPUTE_DTYPE[0]
    return y if dt is None else y.astype(dt)


def weighted_mean(per_elem: jax.Array, w: jax.Array | None) -> jax.Array:
    """Batch mean of ``per_elem`` [B, ...] honoring validity weights ``w`` [B].

    With ``w=None`` this is ``jnp.mean(per_elem)`` exactly. With a 0/1 mask
    (the eval loader's SPMD padding mask, data/loader.py) padded rows are
    excluded from the mean — the exact-eval mechanism replacing the padded
    approximation documented as round-2 deviation #8.
    """
    per_elem = per_elem.astype(jnp.float32)
    if w is None:
        return jnp.mean(per_elem)
    per_sample = per_elem.reshape(per_elem.shape[0], -1).mean(axis=1)
    w = w.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1.0)


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm weight ~ N(1.0, 0.02) (reference src/models/utils.py:8-9)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


# flax momentum convention: new = m*old + (1-m)*batch — 0.9 here equals the
# torch default momentum=0.1. train.state._chain_batch_stats reconstructs the
# sequential running-stat chain from this SAME constant; keep them in sync.
BN_MOMENTUM = 0.9


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (momentum 0.1, eps 1e-5) + ref init."""

    use_running_average: bool | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=BN_MOMENTUM,
            epsilon=1e-5,
            scale_init=bn_scale_init,
            name="bn",
        )(x)


class Conv(nn.Module):
    """2D conv with torch-style integer padding and init conventions."""

    features: int
    kernel_size: int | tuple[int, int] = 3
    strides: int = 1
    padding: int | str | Sequence[tuple[int, int]] = 0
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    bias_init: Callable | None = None  # default: torch U(+-1/sqrt(fan_in))
    kernel_mask: np.ndarray | None = None  # constant multiplicative mask (PixelCNN)

    @nn.compact
    def __call__(self, x):
        ks = self.kernel_size
        kh, kw = (ks, ks) if isinstance(ks, int) else ks
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch, self.features)
        )
        if self.kernel_mask is not None:
            kernel = kernel * jnp.asarray(self.kernel_mask, kernel.dtype)
        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding
        def run_conv(xx, kk, pref):
            return jax.lax.conv_general_dilated(
                xx, kk,
                window_strides=(self.strides, self.strides),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pref,
            )

        if _INT8_SERVING[0]:
            y = _int8_apply(self, x, kernel, run_conv)
        else:
            xc, kc = _cast_compute(x, kernel)
            y = _cast_out(run_conv(xc, kc, _pref()))
        if self.use_bias:
            binit = self.bias_init or torch_bias_init(in_ch * kh * kw)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose(nn.Module):
    """Transposed conv matching torch ConvTranspose2d(k=4, s=2, p=1) shapes.

    torch output size: (H-1)*s - 2p + k. Implemented via
    ``lax.conv_transpose`` with explicit padding (k - 1 - p) on each side.
    """

    features: int
    kernel_size: int = 4
    strides: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.strides, self.padding
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (k, k, in_ch, self.features))
        # torch ConvTranspose2d padding p == (k-1-p) input-side padding of the
        # equivalent fractionally-strided conv; torch scatters the kernel
        # unflipped, which corresponds to flipping it for conv_transpose.
        def run_conv(xx, kk, pref):
            return jax.lax.conv_transpose(
                xx, kk,
                strides=(s, s),
                padding=[(k - 1 - p, k - 1 - p)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pref,
            )

        if _INT8_SERVING[0]:
            y = _int8_apply(self, x, kernel[::-1, ::-1], run_conv)
        else:
            xc, kc = _cast_compute(x, kernel[::-1, ::-1])
            y = _cast_out(run_conv(xc, kc, _pref()))
        # torch out = (H-1)*s - 2p + k; crop any overshoot deterministically.
        target = (x.shape[1] - 1) * s - 2 * p + k
        if y.shape[1] != target:
            y = y[:, :target, :target, :]
        if self.use_bias:
            # torch ConvTranspose2d fan_in = out_ch * k * k per its weight layout
            bias = self.param("bias", torch_bias_init(in_ch * k * k), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_f, self.features))
        if _INT8_SERVING[0]:
            y = _int8_apply(self, x, kernel,
                            lambda xx, kk, pref: jnp.dot(
                                xx, kk, preferred_element_type=pref))
        else:
            xc, kc = _cast_compute(x, kernel)
            y = _cast_out(jnp.dot(xc, kc, preferred_element_type=_pref()))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_f), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _l2_normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SNConv(nn.Module):
    """Spectral-normalized Conv (explicit implementation, NHWC)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        ks = self.kernel_size
        kh, kw = (ks, ks) if isinstance(ks, int) else ks
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (kh, kw, in_ch, self.features))
        kernel = _spectral_normalize(self, kernel, update_stats)
        pad = [(self.padding, self.padding)] * 2
        xc, kc = _cast_compute(x, kernel)
        y = jax.lax.conv_general_dilated(
            xc, kc, (self.strides, self.strides), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=_pref(),
        )
        y = _cast_out(y)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_ch * kh * kw), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class SNDense(nn.Module):
    features: int
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_f = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (in_f, self.features))
        kernel = _spectral_normalize(self, kernel, update_stats)
        xc, kc = _cast_compute(x, kernel)
        y = _cast_out(jnp.dot(xc, kc, preferred_element_type=_pref()))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_f), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _spectral_normalize(mod: nn.Module, kernel: jax.Array, update_stats: bool):
    """One torch-style power iteration on kernel viewed as (out, fan_in)."""
    mat = kernel.reshape(-1, kernel.shape[-1]).T
    u_var = mod.variable(
        "spectral", "u",
        lambda: _l2_normalize(jax.random.normal(mod.make_rng("params"), (mat.shape[0],))),
    )
    u = u_var.value
    mat_sg = jax.lax.stop_gradient(mat)
    v = _l2_normalize(mat_sg.T @ u)
    u_new = _l2_normalize(mat_sg @ v)
    if update_stats and mod.is_mutable_collection("spectral"):
        u_var.value = u_new
    u_used, v_used = jax.lax.stop_gradient(u_new), jax.lax.stop_gradient(v)
    sigma = jnp.einsum("i,ij,j->", u_used, mat, v_used)
    return kernel / sigma


def _fold_up_axis(w: jax.Array, axis: int, phase: int) -> jax.Array:
    """1-D factor of the nearest-up(2) + conv3(pad 1) fold along ``axis``.

    With x̃[i] = x[i//2], y[o] = Σ_k W[k]·x̃[o+k-1] splits by output parity:
      y[2m]   = W0·x[m-1] + (W1+W2)·x[m]     (phase 0: taps [W0, W1+W2])
      y[2m+1] = (W0+W1)·x[m] + W2·x[m+1]     (phase 1: taps [W0+W1, W2])
    """
    w0, w1, w2 = jnp.split(w, 3, axis=axis)
    if phase == 0:
        return jnp.concatenate([w0, w1 + w2], axis=axis)
    return jnp.concatenate([w0 + w1, w2], axis=axis)


def upsampled_conv3x3(x: jax.Array, kernel: jax.Array,
                      pref=None) -> jax.Array:
    """``conv3x3(pad=1)(nearest_up2(x))`` without materializing the upsample.

    Phase decomposition: the composite linear map splits into four dense
    2x2-tap convs on the LOW-res input (one per output-pixel parity), whose
    outputs interleave to the high-res result. Exact (same sums, re-
    associated); 2.25x fewer MACs than conv at the upsampled resolution and
    no HBM round-trip for the 4x-size upsampled tensor.
    """
    b, h, w, _ = x.shape
    rows = []
    for a in (0, 1):
        cols = []
        for bb in (0, 1):
            k_ab = _fold_up_axis(_fold_up_axis(kernel, 0, a), 1, bb)
            pad = [(1, 0) if a == 0 else (0, 1), (1, 0) if bb == 0 else (0, 1)]
            y = jax.lax.conv_general_dilated(
                x, k_ab, (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pref,
            )
            cols.append(y)
        rows.append(jnp.stack(cols, axis=3))  # [B,h,w,2(b),C]
    y = jnp.stack(rows, axis=2)  # [B,h,2(a),w,2(b),C]
    return y.reshape(b, 2 * h, 2 * w, -1)


def _up4_kernel(w: jax.Array) -> jax.Array:
    """3x3 kernel -> 4x4 composite ``W4[i,j] = Σ_{di,dj∈{0,1}} W[i-di,j-dj]``
    (the 2-D full convolution of W with ones(2,2), i.e. nearest-up2 folded
    INTO the kernel instead of into four phase kernels)."""
    p = jnp.pad
    return (p(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
            + p(w, ((0, 1), (1, 0), (0, 0), (0, 0)))
            + p(w, ((1, 0), (0, 1), (0, 0), (0, 0)))
            + p(w, ((1, 0), (1, 0), (0, 0), (0, 0))))


def upsampled_conv3x3_dilated(x: jax.Array, kernel: jax.Array,
                              pref=None) -> jax.Array:
    """``conv3x3(pad=1)(nearest_up2(x))`` as ONE lhs-dilated conv.

    Same re-association as :func:`upsampled_conv3x3` (exact), but the
    2H x 2W output is written directly by the conv — no phase stack /
    interleave concat / layout copy. Measured in the fused GAN step the
    phase version's interleave materialization cost ~1.26 ms/step
    (pad_maximum/copy fusions in the round-3 profile); this form deletes it.
    """
    return jax.lax.conv_general_dilated(
        x, _up4_kernel(kernel), (1, 1), [(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )


# full-step A/B'd implementation switch (tools/profile_gan_step.py):
# 'dilated' or 'phase4' — see docs/DESIGN.md round-3 notes for the numbers.
UPCONV_IMPL = ["dilated"]


class UpsampledConv(nn.Module):
    """Fused nearest-up(2) + Conv(3x3, pad 1). Param-compatible with Conv
    (same "kernel"/"bias" shapes) so it can transparently replace the
    upsample->conv pair in generator blocks."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (3, 3, in_ch, self.features))
        if _INT8_SERVING[0]:
            # quantize the COMPOSITE 4x4 kernel (one rounding step) and run
            # the lhs-dilated form; inserted zeros quantize exactly
            def run_conv(xx, kk, pref):
                return jax.lax.conv_general_dilated(
                    xx, kk, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=pref)

            y = _int8_apply(self, x, _up4_kernel(kernel), run_conv)
        else:
            xc, kc = _cast_compute(x, kernel)
            impl = (upsampled_conv3x3_dilated if UPCONV_IMPL[0] == "dilated"
                    else upsampled_conv3x3)
            y = _cast_out(impl(xc, kc, pref=_pref()))
        if self.use_bias:
            binit = self.bias_init or torch_bias_init(in_ch * 9)
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _fold_pool_axis(w: jax.Array, axis: int) -> jax.Array:
    """1-D factor of the conv3(pad 1) + avgpool(2) fold along ``axis``:
    pooled y[m] = ½ Σ_{a∈{0,1}} Σ_k W[k]·x[2m+a+k-1] = Σ_u K[u]·x[2m+u-1]
    with K = ½·[W0, W0+W1, W1+W2, W2] (4 taps, stride 2, pad 1)."""
    w0, w1, w2 = jnp.split(w, 3, axis=axis)
    return 0.5 * jnp.concatenate([w0, w0 + w1, w1 + w2, w2], axis=axis)


def conv3x3_avgpool(x: jax.Array, kernel: jax.Array, pref=None) -> jax.Array:
    """``avg_pool2(conv3x3(pad=1)(x))`` as ONE stride-2 conv with a folded
    4x4 kernel — exact, 2.25x fewer MACs, no intermediate full-res tensor."""
    k = _fold_pool_axis(_fold_pool_axis(kernel, 0), 1)
    return jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )


class SNConvPool(nn.Module):
    """Fused spectral-normalized Conv(3x3, pad 1) + avg_pool(2).

    Spectral norm is computed on the ORIGINAL 3x3 kernel (parity with torch
    SN on the conv weight); the normalized kernel is then folded with the
    pooling. Param/variable-compatible with SNConv."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (3, 3, in_ch, self.features))
        kernel = _spectral_normalize(self, kernel, update_stats)
        xc, kc = _cast_compute(x, kernel)
        y = _cast_out(conv3x3_avgpool(xc, kc, pref=_pref()))
        if self.use_bias:
            bias = self.param("bias", torch_bias_init(in_ch * 9), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def upsample_nearest(x: jax.Array, scale: int) -> jax.Array:
    """Nearest-neighbor upsample (reference nn.Upsample mode='nearest')."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)


def add_upsampled_nearest(h: jax.Array, sc: jax.Array,
                          scale: int = 2) -> jax.Array:
    """``h + upsample_nearest(sc, scale)`` expressed as a broadcast add on a
    reshaped view. Measured on v5e: identical throughput to the explicit
    upsample (XLA materializes the broadcast either way, and that
    materialization IS the residual-output write, already at HBM peak) —
    kept as the direct expression of intent, not as an optimization."""
    b, H, W, c = h.shape
    hv = h.reshape(b, H // scale, scale, W // scale, scale, c)
    out = hv + sc[:, :, None, :, None, :].astype(h.dtype)
    return out.reshape(b, H, W, c)


def conv3x3_s2d(x: jax.Array, kernel: jax.Array, factor: int = 4,
                pref=None) -> jax.Array:
    """conv3x3(pad=1) with TINY output-channel count, computed space-to-
    depth so output channels fill MXU lanes.

    The generator's final 256->3 conv runs at ~9 TFLOP/s (3 of 128 output
    lanes used). Rewriting output pixels as channels — stride-``factor``
    conv with a (factor+2)^2 kernel holding each output phase's 3x3 taps —
    raises lane utilization ``factor^2``-fold for ``(factor+2)^2/9``-fold
    more MACs: net ~4x at factor=4. Exact: every output element is the same
    3x3 sum, re-indexed.
    """
    fh = fw = factor
    kh, kw, cin, cout = kernel.shape
    assert kh == kw == 3
    kp = jnp.zeros((fh + 2, fw + 2, cin, fh * fw * cout), kernel.dtype)
    for a in range(fh):
        for b in range(fw):
            block = jnp.zeros((fh + 2, fw + 2, cin, cout), kernel.dtype)
            block = jax.lax.dynamic_update_slice(block, kernel, (a, b, 0, 0))
            kp = jax.lax.dynamic_update_slice(
                kp, block, (0, 0, 0, (a * fw + b) * cout))
    y = jax.lax.conv_general_dilated(
        x, kp, (fh, fw), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pref,
    )
    B, Hf, Wf, _ = y.shape
    y = y.reshape(B, Hf, Wf, fh, fw, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # depth-to-space
    return y.reshape(B, Hf * fh, Wf * fw, cout)


class ConvS2D(nn.Module):
    """Conv(3x3, pad 1) with space-to-depth lowering for tiny output-channel
    counts (the generators' image-space head). Param-compatible with Conv."""

    features: int
    factor: int = 4
    kernel_init: Callable = torch_kernel_init
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, in_ch, self.features))
        xc, kc = _cast_compute(x, kernel)
        y = _cast_out(conv3x3_s2d(xc, kc, self.factor, pref=_pref()))
        bias = self.param("bias", self.bias_init or torch_bias_init(in_ch * 9),
                          (self.features,))
        return y + bias.astype(y.dtype)


def avg_pool(x: jax.Array, window: int = 2) -> jax.Array:
    return nn.avg_pool(x, (window, window), strides=(window, window))


def max_pool(x: jax.Array, window: int = 2) -> jax.Array:
    return nn.max_pool(x, (window, window), strides=(window, window))


def global_sum_pool(x: jax.Array) -> jax.Array:
    """Sum over spatial dims (reference cgan.py GlobalSumPooling)."""
    return jnp.sum(x, axis=(1, 2))
