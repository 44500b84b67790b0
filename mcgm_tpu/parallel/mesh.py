"""Device mesh and sharding helpers.

The reference's only parallelism is single-process torch DataParallel over
CUDA peers (reference src/train_vae.py:72-73, src/train_gan.py:96-98). Here
the equivalent — and its multi-host generalization — is SPMD over a
``jax.sharding.Mesh``:

- a 1-D ``data`` axis shards the batch over ICI; parameters/state are
  replicated; gradient reduction is inserted by XLA (psum) during jit
  compilation of the global-view step function;
- the ``cfg['world_size']`` knob maps to the mesh size;
- a second ``model`` axis carries tensor parallelism: ``shard_params``
  places output-channel axes over it (``cfg['model_size']`` > 1), XLA's
  SPMD partitioner inserts the collectives, and ``with_state_shardings``
  pins step outputs so the placement survives updates.

No per-replica loss averaging is needed: the step computes the global-batch
loss directly (the reference had to ``.mean()`` replica losses —
train_vae.py:108).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devices = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def make_seed_mesh(n_seed: int, devices=None) -> Mesh:
    """1-D ``seed`` mesh for seed-parallel sweeps (train/seed_parallel.py):
    the stacked [S, ...] experiment axis shards over devices, so each chip
    trains its own S/n_seed seeds with ZERO collectives — embarrassingly
    parallel, the direct SPMD replacement of the reference's per-seed GPU
    job round-robin (reference make.py:27, 55-60)."""
    devices = devices if devices is not None else jax.devices()
    if len(devices) < n_seed:
        raise ValueError(f"seed mesh needs {n_seed} devices, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[:n_seed]), axis_names=("seed",))


def make_spatial_mesh(n_data: int | None = None, n_spatial: int = 1,
                      devices=None) -> Mesh:
    """(data, spatial) mesh for spatial partitioning: images shard over BOTH
    the batch axis and the height axis. The image-model analog of sequence
    parallelism (SURVEY §5.7 — these models have no sequence axis; H is the
    long dimension): each device holds a horizontal band of every image in
    its batch shard, and XLA's SPMD partitioner inserts the halo exchanges
    convolutions need at band edges and turns BN's (B, H, W) statistics into
    global reductions. Lets activations scale past one chip's HBM at high
    resolution (the 128px protocol's 67 MB/tensor regime) with NO model
    changes — pure annotation, the scaling-book recipe."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_spatial
    devices = np.asarray(devices[: n_data * n_spatial]).reshape(
        n_data, n_spatial)
    return Mesh(devices, axis_names=("data", "spatial"))


def spatial_data_sharding(mesh: Mesh):
    """Per-leaf batch sharding rule for a (data, spatial) mesh: image-like
    leaves (ndim >= 3, NHWC) shard batch over ``data`` AND height over
    ``spatial``; vectors (labels, masks) shard over ``data`` only. Returned
    as a callable so the loader can place each leaf by rank (a single
    NamedSharding cannot express the rank-dependent choice)."""
    img_sh = NamedSharding(mesh, P("data", "spatial"))
    vec_sh = NamedSharding(mesh, P("data"))
    return lambda v: img_sh if getattr(v, "ndim", 0) >= 3 else vec_sh


def shard_batch_spatial(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch with batch over ``data`` and, for image-like
    leaves (ndim >= 3, NHWC), height additionally over ``spatial``."""
    img_sh = NamedSharding(mesh, P("data", "spatial"))
    vec_sh = NamedSharding(mesh, P("data"))

    def place(v):
        if not hasattr(v, "shape") or getattr(v, "ndim", 0) == 0:
            return v
        return jax.device_put(v, img_sh if v.ndim >= 3 else vec_sh)

    return {k: place(v) for k, v in batch.items()}


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params / state / opt_state)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch with the leading axis sharded over ``data``."""
    sharding = NamedSharding(mesh, P("data"))
    return {
        k: (jax.device_put(v, sharding) if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0 else v)
        for k, v in batch.items()
    }


def shard_params(mesh: Mesh, tree, min_elements: int = 4096):
    """Tensor-parallel placement over the mesh's ``model`` axis.

    The reference needs no TP for parity (SURVEY §2.10: largest model is tens
    of MB), but the mesh keeps a named ``model`` axis so tensor shardings stay
    expressible. This is the policy that makes that axis real: every leaf
    whose trailing (output-channel) axis divides the model-axis size and that
    is large enough to matter is sharded over ``model``; everything else
    (biases, norm scales, BN stats, spectral-norm vectors, RNG keys) is
    replicated. Inside ``jit`` XLA's SPMD partitioner then runs
    column-parallel matmuls/convs and inserts the all-gathers/psums itself —
    the scaling-book recipe (annotate, let the compiler place collectives).

    Works on any pytree of arrays: params, mutable state, and optimizer
    state (Adam mu/nu mirror the param shapes, so they shard identically).
    With ``n_model == 1`` this degrades to full replication.
    """
    n_model = mesh.shape["model"]
    repl = NamedSharding(mesh, P())

    def place(leaf):
        if not hasattr(leaf, "shape"):
            return leaf
        nd = getattr(leaf, "ndim", 0)
        if (n_model > 1 and nd >= 1 and leaf.shape[-1] % n_model == 0
                and leaf.size >= min_elements):
            spec = P(*([None] * (nd - 1)), "model")
            return jax.device_put(leaf, NamedSharding(mesh, spec))
        return jax.device_put(leaf, repl)

    return jax.tree_util.tree_map(place, tree)


def state_shardings(tree):
    """Pytree of each leaf's current sharding (for pinning step outputs)."""
    return jax.tree_util.tree_map(lambda l: l.sharding, tree)


def with_state_shardings(step, shardings):
    """Wrap ``step(ts, batch)`` so the updated state keeps its placement.

    Without a constraint, XLA's propagation is free to return updated params
    replicated (or in whatever layout the last op produced), silently undoing
    tensor-parallel placement after one step. The constraint is applied
    inside the traced function, so it costs nothing when propagation already
    agrees.
    """

    def wrapped(ts, batch):
        ts2, aux = step(ts, batch)
        ts2 = jax.tree_util.tree_map(jax.lax.with_sharding_constraint,
                                     ts2, shardings)
        return ts2, aux

    return wrapped
