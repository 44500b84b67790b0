"""Multi-scale Glow: CGlow (class-embedding prior) and MCGlow (MC-gated
coupling nets).

Behavioral port of reference src/models/cglow.py and src/models/mcglow.py:

- per-flow: data-dependent-init ActNorm, LU-parameterized invertible 1x1 conv
  (fixed P / sign(s); learned L, U, log|s|), affine coupling with
  ``s = sigmoid(log_s + 2)``;
- per-block: space-to-depth squeeze, K flows, split prior (ZeroConv producing
  mean/log_sd) except the last block, whose prior is conditioned — MCGlow via
  MC inside every coupling net, CGlow via a zero-init 1x1 conv on the one-hot
  indicator added to the final prior only (reference cglow.py:214, 233-234);
- loss: bits/dim with uniform dequantization noise ``x*0.5 + U/256`` and NaN
  masking (zeroed in training, dropped in eval — reference mcglow.py:283-293);
- ``reverse``/``generate``: per-level z cascade, output clamped to
  [-0.5, 0.5] * 2.

TPU-first notes: channels-last layout; the 1x1 invconv is a pure channel
matmul (one MXU op per flow); logdet terms are computed in float32 (the
reference's float64 slogdet path exists only for the non-LU variant, which is
off by default — conv_lu=True).

ActNorm data-dependent init is an explicit ``ddi=True`` forward pass with
``mutable=['params']`` over the first batches (the analog of reference
train_glow.py:60-67), instead of hidden in-place buffer flips.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.controller import MultimodalController, one_hot
from ..ops.layers import Conv


def gaussian_log_p(x, mean, log_sd):
    return -0.5 * math.log(2 * math.pi) - log_sd - 0.5 * (x - mean) ** 2 / jnp.exp(2 * log_sd)


def gaussian_sample(eps, mean, log_sd):
    return mean + jnp.exp(log_sd) * eps


class ActNorm(nn.Module):
    """Per-channel affine with data-dependent init (reference mcglow.py:24-55)."""

    features: int
    logdet: bool = True

    @nn.compact
    def __call__(self, x, ddi: bool = False, reverse: bool = False):
        loc = self.param("loc", nn.initializers.zeros, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        if ddi and not self.is_initializing():
            mean = jnp.mean(x, axis=tuple(range(x.ndim - 1)))
            std = jnp.std(x, axis=tuple(range(x.ndim - 1)), ddof=1)
            loc = -mean
            scale = 1.0 / (std + 1e-6)
            self.put_variable("params", "loc", loc)
            self.put_variable("params", "scale", scale)
        if reverse:
            return x / scale - loc
        out = scale * (x + loc)
        if self.logdet:
            h, w = x.shape[1], x.shape[2]
            det = h * w * jnp.sum(jnp.log(jnp.abs(scale)))
            return out, det
        return out


class InvConv2dLU(nn.Module):
    """LU-parameterized invertible 1x1 conv (reference mcglow.py:76-116).

    Fixed permutation P and sign(s) from a QR+LU decomposition of a random
    matrix; trainable L (unit lower-tri), U (strict upper-tri), log|s|.
    Forward is one channels-last matmul; logdet = H*W*sum(log|s|).
    """

    features: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        C = self.features
        # One QR+LU decomposition of a random matrix seeds every piece. It runs
        # inside the 'glow_const' variable init (jax-native, so it also traces
        # cleanly); the trainable params read their initial values from the
        # holder. The zeros fallback only feeds flax's shape-validation
        # eval_shape pass during apply — it is never materialized as a value.
        holder: dict = {}

        def const_init():
            key = self.make_rng("params")
            w = jax.random.normal(key, (C, C), jnp.float32)
            q, _ = jnp.linalg.qr(w)
            p, l, u = jax.scipy.linalg.lu(q)
            s = jnp.diagonal(u)
            holder["w_l"] = l
            holder["w_s"] = jnp.log(jnp.abs(s))
            holder["w_u"] = jnp.triu(u, 1)
            return {"w_p": p, "s_sign": jnp.sign(s)}

        const = self.variable("glow_const", "const", const_init)

        def param_init(name, shape):
            return lambda _rng: holder.get(name, jnp.zeros(shape, jnp.float32))

        w_l = self.param("w_l", param_init("w_l", (C, C)))
        w_s = self.param("w_s", param_init("w_s", (C,)))
        w_u = self.param("w_u", param_init("w_u", (C, C)))
        l_mask = jnp.tril(jnp.ones((C, C)), -1)
        u_mask = l_mask.T
        eye = jnp.eye(C)
        weight = (
            const.value["w_p"]
            @ (w_l * l_mask + eye)
            @ (w_u * u_mask + jnp.diag(const.value["s_sign"] * jnp.exp(w_s)))
        )
        if reverse:
            return x @ jnp.linalg.inv(weight).T
        out = x @ weight.T  # y_o = sum_i W[o,i] x_i, matching torch 1x1 conv
        h, w_dim = x.shape[1], x.shape[2]
        logdet = h * w_dim * jnp.sum(w_s)
        return out, logdet


class InvConv2d(nn.Module):
    """Plain invertible 1x1 conv (reference mcglow.py:58-73); f32 slogdet."""

    features: int

    @nn.compact
    def __call__(self, x, reverse: bool = False):
        def init(rng):
            w = jax.random.normal(rng, (self.features, self.features))
            q, _ = jnp.linalg.qr(w)
            return q

        weight = self.param("weight", init)
        if reverse:
            return x @ jnp.linalg.inv(weight).T
        out = x @ weight.T
        h, w_dim = x.shape[1], x.shape[2]
        logdet = h * w_dim * jnp.linalg.slogdet(weight)[1]
        return out, logdet


class ZeroConv2d(nn.Module):
    """Zero-init conv with learned output scale exp(3*s) (reference mcglow.py:119-130)."""

    features: int
    kernel_size: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        out = Conv(self.features, self.kernel_size, 1, self.padding,
                   kernel_init=nn.initializers.zeros,
                   bias_init=nn.initializers.zeros,
                   name="conv")(x)
        scale = self.param("scale", nn.initializers.zeros, (self.features,))
        return out * jnp.exp(scale * 3.0)


class _CouplingNet(nn.Module):
    """conv3-ActNorm-ReLU-[MC]-conv1-ActNorm-ReLU-[MC]-ZeroConv
    (reference mcglow.py:133-151)."""

    out_size: int
    hidden_size: int
    num_mode: int | None
    controller_rate: float | None

    @nn.compact
    def __call__(self, x, indicator, ddi: bool = False):
        normal05 = nn.initializers.normal(stddev=0.05)
        zeros = nn.initializers.zeros
        x = Conv(self.hidden_size, 3, 1, 1, kernel_init=normal05, bias_init=zeros)(x)
        x = ActNorm(self.hidden_size, logdet=False)(x, ddi=ddi)
        x = nn.relu(x)
        if self.num_mode is not None:
            x = MultimodalController(self.hidden_size, self.num_mode,
                                     self.controller_rate)(x, indicator)
        x = Conv(self.hidden_size, 1, 1, 0, kernel_init=normal05, bias_init=zeros)(x)
        x = ActNorm(self.hidden_size, logdet=False)(x, ddi=ddi)
        x = nn.relu(x)
        if self.num_mode is not None:
            x = MultimodalController(self.hidden_size, self.num_mode,
                                     self.controller_rate)(x, indicator)
        return ZeroConv2d(self.out_size)(x)


class AffineCoupling(nn.Module):
    input_size: int
    hidden_size: int = 512
    affine: bool = True
    num_mode: int | None = None
    controller_rate: float | None = None

    def setup(self):
        out = self.input_size if self.affine else self.input_size // 2
        self.net = _CouplingNet(out, self.hidden_size, self.num_mode, self.controller_rate)

    def __call__(self, x, indicator, ddi: bool = False):
        in_a, in_b = jnp.split(x, 2, axis=-1)
        if self.affine:
            log_s, t = jnp.split(self.net(in_a, indicator, ddi), 2, axis=-1)
            s = nn.sigmoid(log_s + 2.0)
            out_b = (in_b + t) * s
            logdet = jnp.sum(jnp.log(s).reshape(x.shape[0], -1), axis=1)
        else:
            out_b = in_b + self.net(in_a, indicator, ddi)
            logdet = None
        return jnp.concatenate([in_a, out_b], axis=-1), logdet

    def reverse(self, y, indicator):
        out_a, out_b = jnp.split(y, 2, axis=-1)
        if self.affine:
            log_s, t = jnp.split(self.net(out_a, indicator), 2, axis=-1)
            s = nn.sigmoid(log_s + 2.0)
            in_b = out_b / s - t
        else:
            in_b = out_b - self.net(out_a, indicator)
        return jnp.concatenate([out_a, in_b], axis=-1)


class Flow(nn.Module):
    input_size: int
    hidden_size: int
    affine: bool = True
    conv_lu: bool = True
    num_mode: int | None = None
    controller_rate: float | None = None

    def setup(self):
        self.actnorm = ActNorm(self.input_size)
        self.invconv = (InvConv2dLU if self.conv_lu else InvConv2d)(self.input_size)
        self.coupling = AffineCoupling(
            self.input_size, self.hidden_size, self.affine,
            self.num_mode, self.controller_rate,
        )

    def __call__(self, x, indicator, ddi: bool = False):
        out, logdet = self.actnorm(x, ddi=ddi)
        out, det1 = self.invconv(out)
        out, det2 = self.coupling(out, indicator, ddi=ddi)
        logdet = logdet + det1
        if det2 is not None:
            logdet = logdet + det2
        return out, logdet

    def reverse(self, y, indicator):
        x = self.coupling.reverse(y, indicator)
        x = self.invconv(x, reverse=True)
        x = self.actnorm(x, reverse=True)
        return x


def squeeze2(x):
    """Space-to-depth by 2 (NHWC analog of reference mcglow.py:219-222).

    Channel order is the reference's channels-major (C, 2, 2) layout —
    squeezed channel j = c*4 + a*2 + b for original channel c and spatial
    phase (a, b). This makes the coupling's channel split partition the
    SAME dimensions as the reference flow (and torch checkpoints import
    channel-for-channel, io/torch_import.py)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def unsqueeze2(x):
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * 2, w * 2, c)


class _FlowBody(nn.Module):
    """One flow wrapped for ``nn.scan``: methods take/return (carry, None).

    The K flows of a block are structurally identical, so scanning one body
    over K-stacked parameters compiles one flow instead of K — the canonical
    TPU-first treatment of repeated blocks (cuts Glow trace/compile ~K-fold).
    """

    input_size: int
    hidden_size: int
    affine: bool
    conv_lu: bool
    num_mode: int | None
    controller_rate: float | None

    def setup(self):
        self.flow = Flow(self.input_size, self.hidden_size, self.affine,
                         self.conv_lu, self.num_mode, self.controller_rate)

    def fwd(self, carry, _):
        x, logdet, indicator = carry
        out, det = self.flow(x, indicator)
        return (out, logdet + det, indicator), None

    def ddi_fwd(self, carry, _):
        x, logdet, indicator = carry
        out, det = self.flow(x, indicator, ddi=True)
        return (out, logdet + det, indicator), None

    def rev(self, carry, _):
        y, indicator = carry
        return (self.flow.reverse(y, indicator), indicator), None


class _FlowChunkBody(nn.Module):
    """``chunk`` consecutive flows as ONE scan body.

    The scan length drops K -> K/chunk at TRACE level, so grad-of-scan
    saves the carry and stacks parameter cotangents chunk-x less often —
    unlike ``scan_unroll``, which only changes the emitted while-loop (scan
    AD still stacks residuals per original step; measured neutral). With
    ``remat_flows`` the whole chunk is rematerialized, so the inter-flow
    carries inside a chunk are recomputed, not saved: total recompute FLOPs
    equal the per-flow remat, but the DUS residual traffic shrinks chunk-x.
    """

    input_size: int
    hidden_size: int
    affine: bool
    conv_lu: bool
    num_mode: int | None
    controller_rate: float | None
    chunk: int = 4

    def setup(self):
        self.flows = [
            Flow(self.input_size, self.hidden_size, self.affine,
                 self.conv_lu, self.num_mode, self.controller_rate,
                 name=f"flow_{j}")
            for j in range(self.chunk)
        ]

    def fwd(self, carry, _):
        x, logdet, indicator = carry
        for f in self.flows:
            x, det = f(x, indicator)
            logdet = logdet + det
        return (x, logdet, indicator), None

    def ddi_fwd(self, carry, _):
        x, logdet, indicator = carry
        for f in self.flows:
            x, det = f(x, indicator, ddi=True)
            logdet = logdet + det
        return (x, logdet, indicator), None

    def rev(self, carry, _):
        y, indicator = carry
        for f in self.flows[::-1]:
            y = f.reverse(y, indicator)
        return (y, indicator), None


def detect_glow_scan_chunk(variables):
    """Return the ``scan_chunk`` a variable tree was packed with (1 if the
    scanned leaves use the flat ``flows/flow`` layout, c for ``flow_0..c-1``,
    1 if no scanned leaves exist)."""
    def find(node):
        if isinstance(node, dict):
            if "flows" in node:
                keys = node["flows"].keys()
                return 1 if "flow" in keys else len(keys)
            for v in node.values():
                got = find(v)
                if got is not None:
                    return got
        return None

    return find(variables) or 1


def rechunk_glow_flows(variables, to_chunk, from_chunk=1):
    """Repack scanned-flow leaves between ``scan_chunk`` layouts.

    chunk=1 stacks each flow leaf as ``flows/flow/...: [K, ...]``;
    chunk=c>1 stores ``flows/flow_j/...: [K/c, ...]`` where scan step i's
    body applies global flows ``i*c+j`` for j=0..c-1 — so leaf rows map by
    ``chunked_j[i] = flat[i*c + j]`` (i.e. ``flat[j::c]``). Applies to every
    collection that rides the scan (params / codebook / glow_const)."""
    import flax

    def to_flat(node):
        if isinstance(node, dict) and "flows" in node:
            fl = node["flows"]
            if from_chunk == 1 and "flow" in fl:
                flat = fl["flow"]
            else:
                subs = [fl[f"flow_{j}"] for j in range(from_chunk)]
                # interleave: flat[i*c+j] = sub_j[i]
                def merge(*leaves):
                    k = leaves[0].shape[0] * from_chunk
                    out = jnp.stack(leaves, axis=1)  # [K/c, c, ...]
                    return out.reshape((k,) + leaves[0].shape[1:])
                flat = jax.tree_util.tree_map(merge, *subs)
            node = dict(node)
            if to_chunk == 1:
                node["flows"] = {"flow": flat}
            else:
                node["flows"] = {
                    f"flow_{j}": jax.tree_util.tree_map(
                        lambda l, j=j: l[j::to_chunk], flat)
                    for j in range(to_chunk)
                }
            return node
        if isinstance(node, dict):
            return {k: to_flat(v) for k, v in node.items()}
        return node

    return to_flat(flax.core.unfreeze(variables))


class Block(nn.Module):
    """Squeeze + K flows + split prior (reference mcglow.py:204-265)."""

    input_size: int  # channels before squeeze
    hidden_size: int
    K: int
    split: bool = True
    affine: bool = True
    conv_lu: bool = True
    num_mode: int | None = None
    controller_rate: float | None = None
    cond_prior: bool = False  # CGlow: one-hot embedding added to final prior
    scan_flows: bool = False  # scan one flow body over K-stacked params
    scan_unroll: int = 1  # lax.scan unroll factor (TPU: trades code size
    #   for fewer stacked-param dynamic-slice round trips per iteration)
    remat_flows: bool = True  # rematerialize each flow in the backward pass:
    #   grad-of-scan otherwise SAVES every flow's coupling activations by
    #   dynamic-update-slice into [K, ...] stacked buffers — measured at
    #   ~41% of the full-size train step's device time (round-3 profile);
    #   recomputing the flow forward is far cheaper than storing it
    scan_chunk: int = 1  # flows per scan body: K/chunk scan steps, so the
    #   carry-save/param-grad DUS traffic shrinks chunk-x at trace level
    #   (what scan_unroll cannot do — see _FlowChunkBody)
    reversible_flows: bool = False  # ops/reversible.py: custom-VJP scan that
    #   reconstructs each flow's input via the inverse in the backward pass —
    #   NO carry saves at all (grad-of-scan, even remat'd, DUS-writes every
    #   step's carry into [K, ...] HBM buffers). Same math; grads equal at
    #   f32 reconstruction tolerance (tests/test_glow_reversible.py)
    pipe_axis: str | None = None  # pipeline-parallel execution of the flow
    #   stack over this mesh axis (parallel/pipeline.py): each device holds
    #   K/P consecutive flows, microbatches rotate via ppermute. Beyond the
    #   reference (its only distribution is DataParallel, SURVEY §2.10).
    #   Requires scan_flows; train fwd only (DDI/init/reverse stay on the
    #   sequential scan — DDI needs full-batch stats in one place).
    pipe_microbatches: int = 0  # 0 -> mesh pipe size

    def setup(self):
        sq = self.input_size * 4
        if self.pipe_axis is not None and not self.scan_flows:
            raise ValueError("pipe_axis requires scan_flows=True (the "
                             "pipeline splits the nn.scan-packed flow stack)")
        if self.reversible_flows:
            if not self.scan_flows or self.scan_chunk != 1:
                raise ValueError("reversible_flows requires scan_flows=True "
                                 "with scan_chunk=1 (it operates on the flat "
                                 "[K, ...] flow packing)")
            if self.pipe_axis is not None:
                raise ValueError("reversible_flows and pipe_axis are mutually "
                                 "exclusive (the pipeline is its own scan "
                                 "executor)")
        if self.scan_flows:
            if self.scan_chunk > 1:
                if self.K % self.scan_chunk:
                    raise ValueError(
                        f"scan_chunk={self.scan_chunk} must divide K={self.K}")
                body_cls, length = _FlowChunkBody, self.K // self.scan_chunk
                extra = (self.scan_chunk,)
            else:
                body_cls, length = _FlowBody, self.K
                extra = ()
            # Pipeline path rebuilds the UNWRAPPED body per stage slice and
            # applies remat itself (glow.py Block._pipelined_fwd).
            self._pipe_body = (body_cls, extra, length)
            if self.remat_flows:
                body_cls = nn.remat(body_cls, methods=["fwd"],
                                    prevent_cse=False)
            common = dict(
                variable_axes={"params": 0, "codebook": 0, "glow_const": 0},
                split_rngs={"params": True},
                length=length,
                unroll=self.scan_unroll,
            )
            Scanned = nn.scan(body_cls, methods={
                "fwd": dict(common),
                "ddi_fwd": dict(common),
                "rev": dict(common, reverse=True),  # flows applied K-1..0
            })
            self.flow_stack = Scanned(sq, self.hidden_size, self.affine,
                                      self.conv_lu, self.num_mode,
                                      self.controller_rate, *extra,
                                      name="flows")
        else:
            self.flows = [
                Flow(sq, self.hidden_size, self.affine, self.conv_lu,
                     self.num_mode, self.controller_rate, name=f"flow_{i}")
                for i in range(self.K)
            ]
        if self.split:
            self.prior = ZeroConv2d(self.input_size * 4)
        else:
            self.prior = ZeroConv2d(self.input_size * 8)
        if self.cond_prior:
            self.embedding = ZeroConv2d(self.input_size * 8, kernel_size=1, padding=0)

    def _prior_h(self, out_like, indicator):
        zero = jnp.zeros_like(out_like)
        h = self.prior(zero)
        if self.cond_prior:
            h = h + self.embedding(indicator[:, None, None, :])
        return h

    def _pipelined_fwd(self, carry):
        """Flow stack as a device pipeline (parallel/pipeline.py): the
        nn.scan-packed per-flow parameters are split over the ``pipe`` mesh
        axis and microbatched activations rotate via ppermute. Semantically
        identical to the sequential scan — flows are per-sample (tested:
        tests/test_pipeline.py)."""
        from ..parallel import pipeline as pl

        body_cls, extra, _length = self._pipe_body
        # parent=None: a detached functional module — applied per stage
        # slice below, never registered as a submodule (the params already
        # live under self.flow_stack).
        body = body_cls(self.input_size * 4, self.hidden_size, self.affine,
                        self.conv_lu, self.num_mode, self.controller_rate,
                        *extra, parent=None)

        def body_fn(slice_vars, c):
            (c2, _) = body.apply(slice_vars, c, None, method="fwd")
            return c2

        if self.remat_flows:
            body_fn = jax.checkpoint(body_fn, prevent_cse=False)
        stacked = dict(self.flow_stack.variables)
        return pl.pipeline_scan(
            body_fn, stacked, carry, axis=self.pipe_axis,
            microbatches=self.pipe_microbatches or None)

    def __call__(self, x, indicator, ddi: bool = False):
        b = x.shape[0]
        out = squeeze2(x)
        if self.scan_flows:
            if self.pipe_axis is not None and not ddi \
                    and not self.is_initializing():
                out, logdet, _ = self._pipelined_fwd(
                    (out, jnp.zeros((b,), jnp.float32), indicator))
            elif self.reversible_flows and not ddi \
                    and not self.is_initializing():
                from ..ops.reversible import make_reversible_stack

                stacked = {coll: tree["flow"] for coll, tree
                           in dict(self.flow_stack.variables).items()}
                run = make_reversible_stack(
                    (self.input_size * 4, self.hidden_size, self.num_mode,
                     self.controller_rate, self.affine, self.conv_lu))
                out, logdet = run(stacked, out,
                                  jnp.zeros((b,), jnp.float32), indicator)
            else:
                method = (self.flow_stack.ddi_fwd if ddi
                          else self.flow_stack.fwd)
                (out, logdet, _), _ = method(
                    (out, jnp.zeros((b,), jnp.float32), indicator), None)
        else:
            logdet = jnp.zeros((), jnp.float32)
            for flow in self.flows:
                out, det = flow(out, indicator, ddi=ddi)
                logdet = logdet + det
        if self.split:
            out, z_new = jnp.split(out, 2, axis=-1)
            mean, log_sd = jnp.split(self.prior(out), 2, axis=-1)
            log_p = gaussian_log_p(z_new, mean, log_sd)
            log_p = jnp.sum(log_p.reshape(b, -1), axis=1)
        else:
            h = self._prior_h(out, indicator)
            mean, log_sd = jnp.split(h, 2, axis=-1)
            log_p = gaussian_log_p(out, mean, log_sd)
            log_p = jnp.sum(log_p.reshape(b, -1), axis=1)
            z_new = out
        return out, logdet, log_p, z_new

    def reverse(self, y, indicator, eps=None, reconstruct: bool = False):
        if reconstruct:
            x = jnp.concatenate([y, eps], axis=-1) if self.split else eps
        else:
            if self.split:
                mean, log_sd = jnp.split(self.prior(y), 2, axis=-1)
                z = gaussian_sample(eps, mean, log_sd)
                x = jnp.concatenate([y, z], axis=-1)
            else:
                h = self._prior_h(y, indicator)
                mean, log_sd = jnp.split(h, 2, axis=-1)
                x = gaussian_sample(eps, mean, log_sd)
        if self.scan_flows:
            (x, _), _ = self.flow_stack.rev((x, indicator), None)
        else:
            for flow in self.flows[::-1]:
                x = flow.reverse(x, indicator)
        return unsqueeze2(x)


class _GlowBase(nn.Module):
    def loss_fn(self, log_p, logdet, train: bool, w=None):
        """bits/dim with NaN masking (reference mcglow.py:283-293).

        ``w`` [B]: SPMD eval padding mask — padded rows are dropped the same
        way NaN rows are (they never enter the mean).
        """
        n_pixel = float(np.prod(self.data_shape))
        loss = -math.log(256.0) * n_pixel + logdet + log_p
        loss = -loss / (math.log(2.0) * n_pixel)
        nan = jnp.isnan(loss) | jnp.isinf(loss)
        if w is not None:
            nan = nan | (w <= 0)
        if train and w is None:
            return jnp.mean(jnp.where(nan, 0.0, loss))
        ok = jnp.sum(~nan)
        mean = jnp.sum(jnp.where(nan, 0.0, loss)) / jnp.maximum(ok, 1)
        # All rows NaN/padded ⇒ NaN, matching the reference's mean-of-empty
        # (mcglow.py:283-293). Returning 0.0 here would let a fully-diverged
        # epoch win the min-Loss ``_best`` pivot with a "perfect" score.
        return jnp.where(ok > 0, mean, jnp.float32(jnp.nan))

    def __call__(self, batch, train: bool = False, ddi: bool = False):
        indicator = one_hot(batch["label"], self.num_mode)
        x = batch["img"] * 0.5
        noise = jax.random.uniform(self.make_rng("noise"), x.shape, x.dtype)
        x = x + noise / 256.0
        z_list = []
        log_p_sum = jnp.zeros((x.shape[0],), jnp.float32)
        logdet = jnp.zeros((), jnp.float32)
        for block in self.blocks:
            x, det, log_p, z_new = block(x, indicator, ddi=ddi)
            z_list.append(z_new)
            logdet = logdet + det
            log_p_sum = log_p_sum + log_p
        loss = self.loss_fn(log_p_sum, logdet, train, batch.get("w"))
        return {"loss": loss, "z": z_list}

    def reverse(self, z_list, C, reconstruct: bool = False):
        indicator = one_hot(C, self.num_mode)
        x = None
        n = len(self.blocks)
        for i, block in enumerate(self.blocks[::-1]):
            if i == 0:
                x = block.reverse(z_list[-1], indicator, eps=z_list[-1],
                                  reconstruct=reconstruct)
            else:
                x = block.reverse(x, indicator, eps=z_list[n - 1 - i],
                                  reconstruct=reconstruct)
        return jnp.clip(x, -0.5, 0.5) * 2.0

    def make_z_shapes(self):
        """Per-level latent shapes, HWC (reference mcglow.py:338-350)."""
        h, w, c = self.data_shape
        shapes = []
        for _ in range(self.L - 1):
            h, w, c = h // 2, w // 2, c * 2
            shapes.append((h, w, c))
        shapes.append((h // 2, w // 2, c * 4))
        return shapes

    def generate(self, C, z=None, temperature: float = 1.0):
        if z is None:
            shapes = self.make_z_shapes()
            z = []
            for i, s in enumerate(shapes):
                key = self.make_rng("z")
                z.append(jax.random.normal(key, (C.shape[0], *s)) * temperature)
        return self.reverse(z, C, reconstruct=False)


class MCGlow(_GlowBase):
    data_shape: tuple = (32, 32, 3)
    hidden_size: int = 512
    K: int = 16
    L: int = 3
    affine: bool = True
    conv_lu: bool = True
    num_mode: int = 10
    controller_rate: float = 0.5
    scan_flows: bool = False
    scan_unroll: int = 1
    remat_flows: bool = True
    scan_chunk: int = 1
    reversible_flows: bool = False
    pipe_axis: str | None = None
    pipe_microbatches: int = 0

    def setup(self):
        blocks = []
        c = self.data_shape[-1]
        for i in range(self.L - 1):
            blocks.append(Block(c, self.hidden_size, self.K, True, self.affine,
                                self.conv_lu, self.num_mode, self.controller_rate,
                                scan_flows=self.scan_flows, scan_unroll=self.scan_unroll,
                                remat_flows=self.remat_flows,
                                scan_chunk=self.scan_chunk,
                                reversible_flows=self.reversible_flows,
                                pipe_axis=self.pipe_axis,
                                pipe_microbatches=self.pipe_microbatches,
                                name=f"block_{i}"))
            c *= 2
        blocks.append(Block(c, self.hidden_size, self.K, False, self.affine,
                            self.conv_lu, self.num_mode, self.controller_rate,
                            scan_flows=self.scan_flows, scan_unroll=self.scan_unroll,
                                remat_flows=self.remat_flows,
                                scan_chunk=self.scan_chunk,
                                reversible_flows=self.reversible_flows,
                                pipe_axis=self.pipe_axis,
                                pipe_microbatches=self.pipe_microbatches,
                            name=f"block_{self.L - 1}"))
        self.blocks = blocks


class CGlow(_GlowBase):
    """Embedding-conditioned Glow: unconditional flows; the one-hot enters only
    through a zero-init 1x1 conv added to the final (no-split) prior
    (reference cglow.py:214, 233-234)."""

    data_shape: tuple = (32, 32, 3)
    hidden_size: int = 512
    K: int = 16
    L: int = 3
    affine: bool = True
    conv_lu: bool = True
    num_mode: int = 10
    scan_flows: bool = False
    scan_unroll: int = 1
    remat_flows: bool = True
    scan_chunk: int = 1
    reversible_flows: bool = False
    pipe_axis: str | None = None
    pipe_microbatches: int = 0

    def setup(self):
        blocks = []
        c = self.data_shape[-1]
        for i in range(self.L - 1):
            blocks.append(Block(c, self.hidden_size, self.K, True, self.affine,
                                self.conv_lu, None, None,
                                scan_flows=self.scan_flows, scan_unroll=self.scan_unroll,
                                remat_flows=self.remat_flows,
                                scan_chunk=self.scan_chunk,
                                reversible_flows=self.reversible_flows,
                                pipe_axis=self.pipe_axis,
                                pipe_microbatches=self.pipe_microbatches,
                                name=f"block_{i}"))
            c *= 2
        blocks.append(Block(c, self.hidden_size, self.K, False, self.affine,
                            self.conv_lu, None, None, cond_prior=True,
                            scan_flows=self.scan_flows, scan_unroll=self.scan_unroll,
                                remat_flows=self.remat_flows,
                                scan_chunk=self.scan_chunk,
                                reversible_flows=self.reversible_flows,
                                pipe_axis=self.pipe_axis,
                                pipe_microbatches=self.pipe_microbatches,
                            name=f"block_{self.L - 1}"))
        self.blocks = blocks
