"""Train state containers and jitted step factories.

The reference's per-family trainer scripts share one epoch-loop template
(reference src/train_vae.py:98-148); here the per-batch work is a single
jit-compiled step function closed over the model, produced by
:func:`make_train_step` / :func:`make_eval_step`. The GAN's 5:1 D/G
alternation (reference src/train_gan.py:139-176) is fused into one jitted
step in ``make_gan_train_step``.

All functions take/return explicit pytrees — params, mutable model state
(batch_stats / vq_stats / codebook / spectral / glow_const), optimizer state,
and an rng key — so the same step compiles unchanged under a
``jax.sharding.Mesh`` with sharded batches (SPMD data parallel; the analog of
reference DataParallel at src/train_vae.py:72-73, but scaling over ICI).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp
import optax

MUTABLE_STATE = ("batch_stats", "vq_stats", "spectral", "glow_const", "codebook")


def jit_init(model, rngs, *args, **kwargs):
    """Initialize under jit ON THE LOCAL CPU BACKEND: one compiled
    (disk-cached) program instead of thousands of eager dispatches.

    Pinned to CPU because (a) eager/remote dispatch against a tunneled TPU is
    pathological and (b) the MC codebook dedupe runs via ``jax.pure_callback``,
    which remote PJRT backends may not support (axon doesn't). Callers
    ``device_put`` the returned variables wherever they belong.
    """
    import numpy as np

    cpu = jax.devices("cpu")[0]

    def to_cpu(a):
        return (jax.device_put(np.asarray(a), cpu)
                if hasattr(a, "shape") else a)

    rngs = {k: to_cpu(v) for k, v in rngs.items()}
    args = jax.tree_util.tree_map(to_cpu, args)

    @jax.jit
    def f(rngs, args):
        return model.init(rngs, *args, **kwargs)

    with jax.default_device(cpu):
        return f(rngs, args)


def cpu_init(model, rngs, *args, **kwargs):
    """Eager init pinned to the LOCAL CPU backend (fallback path)."""
    import numpy as np

    cpu = jax.devices("cpu")[0]
    host_rngs = {k: jax.device_put(np.asarray(v), cpu) if hasattr(v, "shape")
                 else v for k, v in rngs.items()}
    host_args = jax.tree_util.tree_map(
        lambda a: jax.device_put(np.asarray(a), cpu) if hasattr(a, "shape") else a,
        args)
    with jax.default_device(cpu):
        return model.init(host_rngs, *host_args, **kwargs)


def split_variables(variables: dict) -> tuple[dict, dict]:
    """Split a flax variables dict into (params, state)."""
    params = variables.get("params", {})
    state = {k: v for k, v in variables.items() if k != "params"}
    return params, state


def merge_variables(params: dict, state: dict) -> dict:
    return {"params": params, **state}


@jax.tree_util.register_dataclass
@dataclass
class TrainState:
    params: Any
    state: Any  # non-param variable collections
    opt_state: Any
    rng: Any
    step: Any = field(default_factory=lambda: jnp.zeros((), jnp.int32))


def make_train_step(model, optimizer, rng_streams: tuple[str, ...] = (),
                    remat: bool = False, skip_nonfinite: bool = False):
    """Generic single-model train step: fwd, grad, clip (inside optimizer),
    update, carry mutated state. Loss is ``output['loss']``.

    ``remat``: rematerialize the forward during backprop
    (``jax.checkpoint``) — trades ~1.3x forward FLOPs for not storing
    activations, the standard lever for memory-bound 128px configs /
    larger batches. Gradients are identical (tested).

    ``skip_nonfinite``: the mixed-precision guard (torch AMP GradScaler's
    skip contract): when any gradient is non-finite the whole update —
    params, optimizer state, mutated collections — is dropped and the step
    becomes a no-op (rng/step still advance). Without it a single inf/NaN
    gradient poisons every parameter through clip_by_global_norm's NaN
    norm in ONE step — the mechanism behind cglow's bf16 divergence
    (docs/DESIGN.md round-5 cglow root-cause). The metrics dict gains
    ``skipped`` (0/1) so the logger surfaces the skip rate."""

    def step(ts: TrainState, batch: dict) -> tuple[TrainState, dict]:
        rng, *keys = jax.random.split(ts.rng, len(rng_streams) + 1)
        rngs = dict(zip(rng_streams, keys))

        def loss_fn(params):
            variables = merge_variables(params, ts.state)
            out, mutated = model.apply(
                variables, batch, train=True, rngs=rngs,
                mutable=list(ts.state.keys()),
            )
            return out["loss"], (out, mutated)

        (loss, (out, mutated)), grads = jax.value_and_grad(
            jax.checkpoint(loss_fn) if remat else loss_fn, has_aux=True
        )(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        aux = {"loss": loss, "output": out}
        if skip_nonfinite:
            ok = jnp.isfinite(optax.global_norm(grads))

            def keep(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(ok, n, o), new, old)

            params = keep(params, ts.params)
            opt_state = keep(opt_state, ts.opt_state)
            mutated = keep(mutated, ts.state)
            aux["skipped"] = 1.0 - ok.astype(jnp.float32)
        new_ts = replace(ts, params=params, state=mutated, opt_state=opt_state,
                         rng=rng, step=ts.step + 1)
        return new_ts, aux

    return step


def make_multi_train_step(step, k: int):
    """Run ``k`` train steps in ONE dispatch via ``lax.scan`` over stacked
    batches.

    Amortizes per-dispatch host latency — the dominant cost for the small
    per-step families on a remote/tunneled backend (measured on the v5e
    tunnel: MCVAE 33k → 100k img/s at k=8, reaching the ~0.9 ms/step device
    compute floor; docs/DESIGN.md). ``step`` must return ``(ts, metrics)``
    with scalar metrics (the metric-wrapped step), so the scan stacks k
    scalars, not k activation sets. Semantics are identical to k sequential
    calls (same rng chain, same order).
    """

    def multi(ts, batches):
        def body(ts, b):
            return step(ts, b)

        return jax.lax.scan(body, ts, batches)

    return multi


def make_eval_step(model, rng_streams: tuple[str, ...] = ()):
    """Eval forward (running stats, z=mu etc.); reference ``test`` analog."""

    def step(params, state, batch, rng):
        rngs = dict(zip(rng_streams, jax.random.split(rng, max(len(rng_streams), 1))))
        variables = merge_variables(params, state)
        out = model.apply(variables, batch, train=False, rngs=rngs)
        return out

    return step


@jax.tree_util.register_dataclass
@dataclass
class GANTrainState:
    g_params: Any
    d_params: Any
    state: Any
    g_opt_state: Any
    d_opt_state: Any
    rng: Any
    step: Any = field(default_factory=lambda: jnp.zeros((), jnp.int32))


def _chain_batch_stats(old_state: dict, stacked_muts: dict, k: int,
                       momentum: float | None = None) -> dict:
    """Reconstruct the sequential BN running-stat chain from k vmapped calls.

    Each vmapped generate saw the SAME ``old`` running stats, producing
    ``new_i = m*old + (1-m)*mu_i``; the sequential semantics (reference: k
    generate calls back-to-back) compose to
    ``s_k = m^k*old + sum_i m^(k-1-i)*(new_i - m*old)`` — algebraically
    identical, so the fused G pass changes fp rounding only (~1e-7).
    Only ``batch_stats`` needs the chain: generate mutates nothing else.
    """
    if momentum is None:
        from ..ops.layers import BN_MOMENTUM  # single source of truth

        momentum = BN_MOMENTUM

    def chain(old, stacked):
        s = (momentum ** k) * old
        for i in range(k):
            s = s + (momentum ** (k - 1 - i)) * (stacked[i] - momentum * old)
        return s

    out = dict(old_state)
    if "batch_stats" in old_state and "batch_stats" in stacked_muts:
        out["batch_stats"] = jax.tree_util.tree_map(
            chain, old_state["batch_stats"], stacked_muts["batch_stats"])
    return out


def make_gan_train_step(model, g_opt, d_opt, d_iter: int = 5,
                        loss_type: str = "Hinge", fuse_d_pass: bool = True,
                        unroll: int = 1, remat: bool = False,
                        fuse_g_pass: bool = False):
    """Fused GAN step: ``d_iter`` D updates on the same batch (fresh z each,
    matching reference train_gan.py:139-158) then one G update.

    The discriminator loss is hinge by default:
    ``relu(1 - D(x)) + relu(1 + D(G(z)))``; G maximizes ``D(G(z))``
    (reference train_gan.py:153-155, 171-172). BCE variant supported
    (train_gan.py:148-152).

    ``fuse_d_pass``: run D once on ``concat(real, fake)`` instead of twice —
    mathematically identical (the discriminator has no batch-coupled layers:
    spectral norm + MC gating + sum-pool are per-sample), doubles the matmul
    batch for better MXU utilization at these sizes. The only delta vs the
    reference is one spectral-norm power iteration per D step instead of two
    (u converges to the same vector). Disable for strict parity.
    """

    def _split_params(all_params):
        return all_params["generator"], all_params["discriminator"]

    def _merge(g_params, d_params, state):
        return {"params": {"generator": g_params, "discriminator": d_params},
                **state}

    def _d_losses(d_real, d_fake):
        # losses/metrics in f32 regardless of compute dtype
        d_real, d_fake = d_real.astype(jnp.float32), d_fake.astype(jnp.float32)
        if loss_type == "Hinge":
            return jnp.mean(jax.nn.relu(1.0 - d_real) + jax.nn.relu(1.0 + d_fake))
        # BCE with logits
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(d_real, jnp.ones_like(d_real))
            + optax.sigmoid_binary_cross_entropy(d_fake, jnp.zeros_like(d_fake))
        )

    def _g_loss(d_fake):
        d_fake = d_fake.astype(jnp.float32)
        if loss_type == "Hinge":
            return -jnp.mean(d_fake)
        return jnp.mean(
            optax.sigmoid_binary_cross_entropy(d_fake, jnp.ones_like(d_fake))
        )

    latent = model.latent_size

    def step(ts: GANTrainState, batch: dict):
        img, label = batch["img"], batch["label"]
        B = img.shape[0]

        pre_fakes = None
        pre_state = None
        pre_rng = None
        if fuse_g_pass:
            # The k D-iters' fake batches depend only on (g_params, state,
            # z_i) — all constant across the scan — so ONE vmapped G forward
            # at batch k*B replaces k sequential forwards. vmap keeps BN
            # batch statistics per B-slice (bit-exact semantics vs the
            # reference's separate generate calls); the z chain replays the
            # exact in-scan rng splits; running stats re-chain after.
            r = ts.rng
            zs = []
            for _ in range(d_iter):
                r, zk = jax.random.split(r)
                zs.append(jax.random.normal(zk, (B, latent)))
            pre_rng = r

            def gen_one(z):
                variables = _merge(ts.g_params, ts.d_params, ts.state)
                fake, mut = model.apply(
                    variables, label, z, True, method="generate",
                    mutable=list(ts.state.keys()),
                )
                return jax.lax.stop_gradient(fake), mut

            pre_fakes, muts = jax.vmap(gen_one)(jnp.stack(zs))
            pre_state = _chain_batch_stats(ts.state, muts, d_iter)

        def d_substep(carry, fake_in):
            d_params, d_opt_state, state, rng = carry
            if not fuse_g_pass:
                rng, zkey = jax.random.split(rng)
                z = jax.random.normal(zkey, (B, latent))

            def d_loss_fn(dp):
                if fuse_g_pass:
                    fake, mut1 = fake_in, state
                else:
                    variables = _merge(ts.g_params, dp, state)
                    fake, mut1 = model.apply(
                        variables, label, z, True, method="generate",
                        mutable=list(state.keys()),
                    )
                    fake = jax.lax.stop_gradient(fake)
                variables = _merge(ts.g_params, dp, mut1)
                if fuse_d_pass:
                    # match the real batch to the generator's compute dtype:
                    # otherwise XLA promotes the whole fake tensor to f32 for
                    # the concat (a full-size materialization + layout change)
                    both = jnp.concatenate([img.astype(fake.dtype), fake], axis=0)
                    labels2 = jnp.concatenate([label, label], axis=0)
                    d_out, mut_last = model.apply(
                        variables, both, labels2, True, method="discriminate",
                        mutable=list(state.keys()),
                    )
                    d_real, d_fake = d_out[:B], d_out[B:]
                else:
                    d_real, mut2 = model.apply(
                        variables, img, label, True, method="discriminate",
                        mutable=list(state.keys()),
                    )
                    variables = _merge(ts.g_params, dp, mut2)
                    d_fake, mut_last = model.apply(
                        variables, fake, label, True, method="discriminate",
                        mutable=list(state.keys()),
                    )
                return _d_losses(d_real, d_fake), mut_last

            (d_loss, new_state), grads = jax.value_and_grad(
                jax.checkpoint(d_loss_fn) if remat else d_loss_fn,
                has_aux=True
            )(d_params)
            updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, updates)
            return (d_params, d_opt_state, new_state, rng), d_loss

        carry0 = (ts.d_params, ts.d_opt_state,
                  pre_state if fuse_g_pass else ts.state,
                  pre_rng if fuse_g_pass else ts.rng)
        if unroll >= d_iter:
            # trace-level unroll: avoids grad-through-scan entirely (XLA:CPU
            # compiles that pathologically slowly; TPU production keeps scan)
            carry = carry0
            losses = []
            for i in range(d_iter):
                carry, dl = d_substep(
                    carry, pre_fakes[i] if fuse_g_pass else None)
                losses.append(dl)
            d_params, d_opt_state, state, rng = carry
            d_losses = jnp.stack(losses)
        else:
            (d_params, d_opt_state, state, rng), d_losses = jax.lax.scan(
                d_substep, carry0, pre_fakes, length=d_iter, unroll=unroll,
            )

        rng, zkey = jax.random.split(rng)
        z = jax.random.normal(zkey, (B, latent))

        def g_loss_fn(gp):
            variables = _merge(gp, d_params, state)
            fake, mut1 = model.apply(
                variables, label, z, True, method="generate",
                mutable=list(state.keys()),
            )
            variables = _merge(gp, d_params, mut1)
            d_fake, mut2 = model.apply(
                variables, fake, label, True, method="discriminate",
                mutable=list(state.keys()),
            )
            return _g_loss(d_fake), mut2

        (g_loss, state), grads = jax.value_and_grad(
            jax.checkpoint(g_loss_fn) if remat else g_loss_fn, has_aux=True
        )(ts.g_params)
        updates, g_opt_state = g_opt.update(grads, ts.g_opt_state, ts.g_params)
        g_params = optax.apply_updates(ts.g_params, updates)

        new_ts = GANTrainState(
            g_params=g_params, d_params=d_params, state=state,
            g_opt_state=g_opt_state, d_opt_state=d_opt_state,
            rng=rng, step=ts.step + 1,
        )
        metrics = {"Loss_D": jnp.mean(d_losses), "Loss_G": g_loss,
                   "Loss": jnp.mean(d_losses) + g_loss}
        return new_ts, metrics

    return step
