"""Reversible backprop through Glow flow stacks (zero carry-save memory).

Glow flows are bijections, so the backward pass can RECONSTRUCT each flow's
input from its output via the inverse instead of loading it from a saved
residual. Standard grad-of-``lax.scan`` (even with per-flow ``jax.remat``)
must dynamic-update-slice every scan step's carry into a ``[K, B, H, W, C]``
HBM buffer on the forward and re-read it on the backward — measured at a
double-digit share of the full-size MCGlow train step (docs/DESIGN.md,
"Glow scan tax"). This module replaces that with a ``jax.custom_vjp`` whose

- forward is a plain ``lax.scan`` (no residuals beyond the final carry), and
- backward is one reverse ``lax.scan`` that per flow: (1) inverts the
  coupling with the SAME coupling-net forward the VJP needs (shared — the
  net input ``in_a == out_a`` is the passthrough half, so one net
  application serves both reconstruction and gradient), (2) hand-derives the
  affine-coupling cotangents, (3) inverts actnorm/invconv analytically
  (``inv(W)`` is batch-precomputed over all K flows once, outside the scan)
  and takes their VJP at the reconstructed input (cheap elementwise /
  ``[C,C]`` matmul recompute).

FLOP cost equals the rematerialized scan (one coupling-net forward + one
coupling-net VJP per flow in the backward); the carry-save DUS traffic is
gone entirely. The only stacked writes left are the per-flow parameter
cotangents — inherent to the ``[K, ...]`` parameter packing.

Numerics: the reconstruction replays ``in_b = out_b / s - t`` with the
bit-identical ``(s, t)`` of the forward (same net, same input), so the only
reconstruction error is f32 rounding of the affine inversion itself,
compounded over K flows — equality with autodiff-through-scan gradients is
pinned at f32 tolerance by tests/test_glow_reversible.py.

The reference has no analog (torch autograd stores every activation); this
is the flow-native memory/traffic treatment the architecture invites
(cf. RevNets, Gomez et al. 2017 — recomputing inputs from outputs of
bijective blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _an_fwd(p, x):
    """ActNorm forward (models/glow.py ActNorm.__call__, ddi=False)."""
    out = p["scale"] * (x + p["loc"])
    det = x.shape[1] * x.shape[2] * jnp.sum(jnp.log(jnp.abs(p["scale"])))
    return out, det


def _ic_weight(p, c):
    """Recompose the LU-parameterized 1x1 conv weight
    (models/glow.py InvConv2dLU)."""
    n = p["w_s"].shape[-1]
    l_mask = jnp.tril(jnp.ones((n, n)), -1)
    eye = jnp.eye(n)
    return (
        c["w_p"]
        @ (p["w_l"] * l_mask + eye)
        @ (p["w_u"] * l_mask.T + jnp.diag(c["s_sign"] * jnp.exp(p["w_s"])))
    )


def _ic_fwd_lu(p, c, x):
    out = x @ _ic_weight(p, c).T
    det = x.shape[1] * x.shape[2] * jnp.sum(p["w_s"])
    return out, det


def _ic_fwd_plain(p, x):
    out = x @ p["weight"].T
    det = x.shape[1] * x.shape[2] * jnp.linalg.slogdet(p["weight"])[1]
    return out, det


def _net_vars(vars_k):
    nv = {"params": vars_k["params"]["coupling"]["net"]}
    cb = vars_k.get("codebook")
    if cb is not None:
        nv["codebook"] = cb["coupling"]["net"]
    return nv


def _assign(tree, path, value):
    """Return a copy of nested-dict ``tree`` with ``tree[path...] = value``
    (shallow copies along the path only)."""
    if not path:
        return value
    out = dict(tree)
    out[path[0]] = _assign(tree[path[0]], path[1:], value)
    return out


@functools.lru_cache(maxsize=None)
def make_reversible_stack(spec):
    """Build the reversible-scan executor for one flow-stack shape.

    ``spec`` = (squeezed_channels, hidden_size, num_mode, controller_rate,
    affine, conv_lu); cached so repeated traces reuse one function identity
    (stable jit keys). Returns ``run(stacked, x, logdet0, indicator) ->
    (y, logdet)`` where ``stacked`` is the flow stack's variable tree with
    the ``[K, ...]`` leading axis (collections params / glow_const /
    codebook, already stripped of the ``flow`` scan-body level).
    """
    sq, hidden, num_mode, rate, affine, conv_lu = spec
    # Deferred import: ops.reversible must not import models at module load
    # (models.glow imports ops.*).
    from ..models.glow import _CouplingNet

    out_size = sq if affine else sq // 2
    net = _CouplingNet(out_size, hidden, num_mode, rate, parent=None)

    def coupling_fwd(vars_k, x, ind):
        """AffineCoupling.__call__ as a pure function (models/glow.py)."""
        in_a, in_b = jnp.split(x, 2, axis=-1)
        h = net.apply(_net_vars(vars_k), in_a, ind)
        if affine:
            log_s, t = jnp.split(h, 2, axis=-1)
            s = jax.nn.sigmoid(log_s + 2.0)
            out_b = (in_b + t) * s
            det = jnp.sum(jnp.log(s).reshape(x.shape[0], -1), axis=1)
        else:
            out_b = in_b + h
            det = None
        return jnp.concatenate([in_a, out_b], axis=-1), det

    def flow_fwd(vars_k, x, ind):
        """Flow.__call__ as a pure function: actnorm -> invconv -> coupling."""
        p = vars_k["params"]
        out, det = _an_fwd(p["actnorm"], x)
        if conv_lu:
            out, det1 = _ic_fwd_lu(
                p["invconv"], vars_k["glow_const"]["invconv"]["const"], out)
        else:
            out, det1 = _ic_fwd_plain(p["invconv"], out)
        out, det2 = coupling_fwd(vars_k, out, ind)
        logdet = det + det1
        if det2 is not None:
            logdet = logdet + det2
        return out, logdet

    @jax.custom_vjp
    def run(stacked, x, ld0, ind):
        def body(c, vars_k):
            xx, ld = c
            y, det = flow_fwd(vars_k, xx, ind)
            return (y, ld + det), None

        (y, ld), _ = lax.scan(body, (x, ld0), stacked)
        return y, ld

    def run_fwd(stacked, x, ld0, ind):
        y, ld = run(stacked, x, ld0, ind)
        # Residuals: the stacked params (already live) + the final carry.
        # No per-flow activation is saved anywhere.
        return (y, ld), (stacked, y, ind)

    def run_bwd(res, ct):
        stacked, y_final, ind = res
        ct_y, ct_ld = ct
        # logdet accumulates additively, so its cotangent is constant across
        # the scan: per-sample for coupling dets, summed for scalar dets.
        ct_ld_sum = jnp.sum(ct_ld)
        p_ic = stacked["params"]["invconv"]
        if conv_lu:
            ws = jax.vmap(_ic_weight)(
                p_ic, stacked["glow_const"]["invconv"]["const"])
        else:
            ws = p_ic["weight"]
        inv_ws = jnp.linalg.inv(ws)  # [K, C, C], once per backward

        # Differentiate w.r.t. the trainable params ONLY: stacking per-flow
        # cotangents for glow_const/codebook (never consumed — nothing
        # differentiates the constants) would add dead [K, ...] DUS writes,
        # the very traffic this module exists to remove.
        consts = {c: t for c, t in stacked.items() if c != "params"}

        def ai_fwd(params_k, const_k, xx):
            uu, d_an = _an_fwd(params_k["actnorm"], xx)
            if conv_lu:
                vv, d_ic = _ic_fwd_lu(
                    params_k["invconv"], const_k["glow_const"]["invconv"]["const"], uu)
            else:
                vv, d_ic = _ic_fwd_plain(params_k["invconv"], uu)
            return vv, d_an + d_ic

        def body(c, xs):
            y, ct_y = c
            params_k, const_k, inv_w = xs
            p = params_k
            # --- coupling: invert + VJP sharing ONE net forward -----------
            y_a, y_b = jnp.split(y, 2, axis=-1)
            cb_k = const_k.get("codebook")
            net_consts = (
                {"codebook": cb_k["coupling"]["net"]} if cb_k is not None else {})
            nn_out, nn_vjp = jax.vjp(
                lambda np_, a: net.apply(
                    {"params": np_, **net_consts}, a, ind),
                p["coupling"]["net"], y_a)
            ct_y_a, ct_y_b = jnp.split(ct_y, 2, axis=-1)
            if affine:
                log_s, t = jnp.split(nn_out, 2, axis=-1)
                s = jax.nn.sigmoid(log_s + 2.0)
                v_b = y_b / s - t  # reconstructed in_b
                # out_b = (v_b + t) * s ; det = sum(log s) per sample
                ct_vb = ct_y_b * s
                ct_t = ct_y_b * s
                bshape = (y.shape[0],) + (1,) * (y.ndim - 1)
                ct_s = ct_y_b * (v_b + t) + ct_ld.reshape(bshape) / s
                ct_log_s = ct_s * (s * (1.0 - s))
                ct_nn = jnp.concatenate([ct_log_s, ct_t], axis=-1)
            else:
                v_b = y_b - nn_out
                ct_vb = ct_y_b
                ct_nn = ct_y_b
            ct_net, ct_a_net = nn_vjp(ct_nn.astype(nn_out.dtype))
            v = jnp.concatenate([y_a, v_b], axis=-1)
            ct_v = jnp.concatenate(
                [ct_y_a + ct_a_net.astype(ct_y_a.dtype), ct_vb], axis=-1)
            # --- invconv + actnorm: invert analytically, VJP at the
            # reconstructed input (recompute is one [C,C] matmul + eltwise) -
            u = v @ inv_w.T
            x = u / p["actnorm"]["scale"] - p["actnorm"]["loc"]
            (v_chk, det_s), ai_vjp = jax.vjp(
                lambda pp, xx: ai_fwd(pp, const_k, xx), params_k, x)
            ct_params, ct_x = ai_vjp(
                (ct_v.astype(v_chk.dtype), ct_ld_sum.astype(det_s.dtype)))
            # merge the coupling-net cotangents into the params structure
            ct_params = _assign(ct_params, ("coupling", "net"), ct_net)
            return (x, ct_x.astype(ct_y.dtype)), ct_params

        (_, ct_x0), ct_params_stacked = lax.scan(
            body, (y_final, ct_y), (stacked["params"], consts, inv_ws),
            reverse=True)
        ct_stacked = dict(
            jax.tree_util.tree_map(jnp.zeros_like, consts),
            params=ct_params_stacked)
        return ct_stacked, ct_x0, ct_ld, jnp.zeros_like(ind)

    run.defvjp(run_fwd, run_bwd)
    return run
