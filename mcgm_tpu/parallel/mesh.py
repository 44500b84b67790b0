"""Device mesh and sharding helpers.

The reference's only parallelism is single-process torch DataParallel over
CUDA peers (reference src/train_vae.py:72-73, src/train_gan.py:96-98). Here
the equivalent — and its multi-host generalization — is SPMD over a
``jax.sharding.Mesh``:

- a 1-D ``data`` axis shards the batch over ICI; parameters/state are
  replicated; gradient reduction is inserted by XLA (psum) during jit
  compilation of the global-view step function;
- the ``cfg['world_size']`` knob maps to the mesh size;
- a second (currently trivial) ``model`` axis is kept in the mesh signature
  so tensor-style shardings remain expressible without re-plumbing.

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
