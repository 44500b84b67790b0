"""Multi-host (DCN) support.

The reference is strictly single-node (SURVEY.md §2.10). JAX's SPMD model
makes multi-host a deployment detail rather than a code path: every host runs
the same program, `jax.distributed.initialize()` wires the fleet, and the
global-view jit over the full mesh is unchanged. What does change is data
feeding — each host must supply its local shard of the global batch — which
is what :func:`local_batch_slice` and :func:`make_global_batch` handle.

Usage on a multi-host slice:

    from mcgm_tpu.parallel import multihost, make_mesh
    multihost.initialize()            # no-op on single host
    mesh = make_mesh()                # all devices across hosts
    # loaders yield per-host shards; assemble global arrays:
    global_batch = multihost.make_global_batch(mesh, host_batch)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(**kwargs) -> None:
    """Wire up the multi-host runtime; harmless no-op when already wired.

    kwargs (coordinator_address, num_processes, process_id, ...) are passed
    straight to ``jax.distributed.initialize``. Skips only when the
    distributed client object already exists (a launcher such as the TPU
    pod runtime initialized it first). CRITICAL ordering constraint: this
    must not touch the XLA backend before initializing — even an innocent
    ``jax.process_count()`` instantiates the local backend, after which
    ``jax.distributed.initialize`` unconditionally raises — so the
    already-wired check reads the distributed global state directly.
    """
    try:  # private-state probe; a JAX upgrade may move it — degrade gracefully
        from jax._src import distributed

        if distributed.global_state.client is not None:
            return  # already initialized by the launcher / an earlier call
    except (ImportError, AttributeError):
        pass  # fall through to initialize() and rely on its own error
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # initialized by the launcher; same end state
        if kwargs:
            raise  # explicit multi-host request must not fail silently
    except Exception:
        if kwargs:
            raise  # explicit multi-host request must not fail silently
        # bare single-host call: no coordinator to talk to — fine


def local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """This host's [start, stop) slice of the global batch (by process id)."""
    n_proc = jax.process_count()
    per = global_batch_size // n_proc
    start = jax.process_index() * per
    return start, start + per


def make_global_batch(mesh: Mesh, host_arrays: dict) -> dict:
    """Assemble globally-sharded arrays from per-host shards.

    Each host passes its local shard (leading dim = global/process_count);
    the result is a dict of global jax.Arrays sharded over the mesh's
    ``data`` axis, usable directly by the jitted train step.
    """
    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in host_arrays.items():
        if not hasattr(v, "shape") or getattr(v, "ndim", 0) == 0:
            out[k] = v
            continue
        local = np.asarray(v)
        global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, local, global_shape
        )
    return out
