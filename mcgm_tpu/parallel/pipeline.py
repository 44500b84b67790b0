"""GPipe-style pipeline parallelism over a stacked-block scan.

The reference has no pipeline parallelism (its only distribution is
single-process ``torch.nn.DataParallel`` — SURVEY §2.10); this module is a
TPU-native capability beyond it: a stack of structurally identical blocks
whose parameters are packed along a leading axis (exactly what ``nn.scan``
produces for Glow's K flows per block, models/glow.py) is executed as a
device pipeline. Each device on the mesh's ``pipe`` axis holds a contiguous
slice of the stack, the batch is split into microbatches, and activations
rotate device-to-device over ICI via ``lax.ppermute`` on the classic GPipe
schedule (M + P - 1 ticks, fill/drain bubbles at the ends).

Built on ``jax.shard_map`` so XLA sees the per-device program explicitly;
reverse-mode AD flows through it (the transpose of ``ppermute`` is the
reverse ``ppermute``, and the tick loop is a differentiable ``lax.scan``),
so the same executor serves the training step.

Semantics: exactly the sequential ``lax.scan`` over the full stack, because
the scanned bodies here are per-sample (Glow flows have no batch-coupled
statistics — ActNorm is learned per-channel after init; see
tests/test_pipeline.py for fwd+grad equivalence).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Mesh used by pipelined modules at trace time. Flax module fields must stay
# hashable/static, so the Mesh rides in module-level state set by the caller
# (train-step builders, tests, __graft_entry__) rather than on the module.
_PIPELINE_MESH: Mesh | None = None


def set_pipeline_mesh(mesh: Mesh | None) -> None:
    global _PIPELINE_MESH
    _PIPELINE_MESH = mesh


def get_pipeline_mesh() -> Mesh | None:
    return _PIPELINE_MESH


def make_pipe_mesh(n_data: int | None = None, n_pipe: int = 1,
                   devices=None) -> Mesh:
    """(data, pipe) mesh: batch sharded over ``data``, block stack over
    ``pipe``. Keep ``pipe`` innermost so the per-tick activation rotation
    rides adjacent-ICI hops."""
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_pipe
    devices = np.asarray(devices[: n_data * n_pipe]).reshape(n_data, n_pipe)
    return Mesh(devices, axis_names=("data", "pipe"))


def shard_stacked_over_pipe(mesh: Mesh, tree, stack_len: int):
    """Place every leaf whose leading axis == ``stack_len`` with that axis
    sharded over ``pipe`` (the rest replicated) — the parameter placement
    matching :func:`pipeline_scan`'s in_specs, so each device materializes
    only its own pipeline stage."""
    repl = NamedSharding(mesh, P())

    def place(leaf):
        if getattr(leaf, "ndim", 0) >= 1 and leaf.shape[0] == stack_len:
            nd = leaf.ndim
            return jax.device_put(
                leaf, NamedSharding(mesh, P("pipe", *([None] * (nd - 1)))))
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map(place, tree)


def pipeline_scan(body_fn, stacked, carry, *, mesh: Mesh | None = None,
                  axis: str = "pipe", batch_axis: str | None = "data",
                  microbatches: int | None = None):
    """Run ``carry = body_fn(stacked[i], carry) for i in range(N)`` as a
    device pipeline over ``mesh`` axis ``axis``.

    Args:
      body_fn: one scan step — takes the pytree slice for ONE stack entry
        (no leading axis) and a carry pytree; returns the next carry. Must
        be per-sample along the carry leaves' leading (batch) axis.
      stacked: pytree with a common leading axis N (the stack), N % P == 0.
      carry: pytree; every leaf has the same leading batch axis B, with
        B % microbatches == 0. (Under a ``batch_axis``-sharded caller these
        are the PER-SHARD sizes.)
      mesh: the device mesh (defaults to :func:`get_pipeline_mesh`).
      axis: mesh axis name the stack is split over (P stages).
      batch_axis: mesh axis name the carry's batch dim is sharded over, or
        None if the carry is replicated across the rest of the mesh.
      microbatches: M (default P). Latency is M + P - 1 stage-ticks, so the
        bubble fraction is (P-1)/(M+P-1); raise M to amortize it.

    Returns the final carry, identical (up to float reassociation) to the
    sequential scan.
    """
    mesh = mesh if mesh is not None else _PIPELINE_MESH
    if mesh is None:
        raise ValueError("pipeline_scan: no mesh (set_pipeline_mesh or pass mesh=)")
    n_pipe = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked)
    n_stack = leaves[0].shape[0]
    if n_stack % n_pipe:
        raise ValueError(f"stack length {n_stack} not divisible by "
                         f"{axis}={n_pipe}")
    m = microbatches or n_pipe
    b = jax.tree_util.tree_leaves(carry)[0].shape[0]
    b_local = b // mesh.shape[batch_axis] if batch_axis else b
    if b_local % m:
        raise ValueError(f"per-shard batch {b_local} not divisible by "
                         f"microbatches={m}")

    def spec(rank, name):
        return P(name, *([None] * (rank - 1)))

    stacked_specs = jax.tree_util.tree_map(
        lambda l: spec(l.ndim, axis), stacked)
    carry_specs = jax.tree_util.tree_map(
        lambda l: spec(l.ndim, batch_axis) if batch_axis else P(), carry)

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(stacked_specs, carry_specs),
                       out_specs=carry_specs, check_vma=False)
    def run(stacked_local, carry_local):
        idx = lax.axis_index(axis)
        first = idx == 0
        last = idx == n_pipe - 1
        perm = [(i, (i + 1) % n_pipe) for i in range(n_pipe)]

        # [B_local, ...] -> [M, B_local/M, ...]
        mb = jax.tree_util.tree_map(
            lambda l: l.reshape(m, l.shape[0] // m, *l.shape[1:]),
            carry_local)

        def stage(c):
            def one(c2, s):
                return body_fn(s, c2), None
            return lax.scan(one, c, stacked_local)[0]

        state = jax.tree_util.tree_map(lambda l: jnp.zeros_like(l[0]), mb)
        outbuf = jax.tree_util.tree_map(jnp.zeros_like, mb)

        def tick(acc, t):
            st, ob = acc
            fresh = jax.tree_util.tree_map(
                lambda l: lax.dynamic_index_in_dim(
                    l, jnp.minimum(t, m - 1), keepdims=False), mb)
            cur = jax.tree_util.tree_map(
                lambda f, s: jnp.where(first, f, s), fresh, st)
            out = stage(cur)
            slot = jnp.maximum(t - (n_pipe - 1), 0)
            write = last & (t >= n_pipe - 1)
            ob = jax.tree_util.tree_map(
                lambda bbuf, o: jnp.where(
                    write,
                    lax.dynamic_update_index_in_dim(bbuf, o, slot, 0),
                    bbuf),
                ob, out)
            nxt = jax.tree_util.tree_map(
                lambda o: lax.ppermute(o, axis, perm), out)
            return (nxt, ob), None

        (_, outbuf), _ = lax.scan(tick, (state, outbuf),
                                  jnp.arange(m + n_pipe - 1))
        # Only the last stage wrote real rows; everyone else holds zeros —
        # the psum replicates the result along the pipe axis.
        outbuf = jax.tree_util.tree_map(
            lambda l: lax.psum(l, axis), outbuf)
        return jax.tree_util.tree_map(
            lambda l: l.reshape(l.shape[0] * l.shape[1], *l.shape[2:]),
            outbuf)

    return run(stacked, carry)
