"""Shared logic for the REAL two-process multi-host test
(tests/test_multihost.py::test_two_process_spmd_train_step).

Run as a child: ``python tests/_multihost_child.py <pid> <port> <out.npz>``
— forces a 4-virtual-device CPU platform, wires ``jax.distributed`` over a
localhost coordinator (gloo CPU collectives), and runs :func:`train_steps`.
Imported by the parent test to produce the single-process reference on its
8 virtual devices (same global batch, same seeds).
"""

from __future__ import annotations

import os
import sys

GLOBAL_BATCH = 16
STEPS = 2


def _tiny_cfg():
    return {
        "model_name": "mcvae", "classes_size": 10, "controller_rate": 0.5,
        "data_name": "Synthetic", "data_shape": [32, 32, 3],
        "vae": {"hidden_size": [8, 16, 32], "latent_size": 16,
                "num_res_block": 1, "embedding_size": 8},
    }


def train_steps():
    """Two jitted MCVAE train steps over the full device mesh (however many
    processes are participating), fed through the production multi-host data
    path. Returns (loss_history, params) as host numpy."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mcgm_tpu.models import build_model
    from mcgm_tpu.parallel import make_mesh, multihost
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (TrainState, make_train_step,
                                      split_variables)

    cfg = _tiny_cfg()
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)

    # identical host-side init on every process (local single-device program)
    g = np.linspace(-1.0, 1.0, GLOBAL_BATCH * 32 * 32 * 3, dtype=np.float32)
    g_img = g.reshape(GLOBAL_BATCH, 32, 32, 3)
    g_lbl = (np.arange(GLOBAL_BATCH) % 10).astype(np.int32)
    init_batch = {"img": jnp.asarray(g_img[:2]), "label": jnp.asarray(g_lbl[:2])}
    variables = model.init({"params": rng, "reparam": rng}, init_batch, train=True)
    params, state = split_variables(variables)
    opt = make_optimizer({"optimizer_name": "Adam", "lr": 3e-4,
                          "weight_decay": 0}, grad_clip=1.0)
    ts = TrainState(params=params, state=state, opt_state=opt.init(params),
                    rng=jax.random.PRNGKey(1))

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())

    def replicate_global(tree):
        # multi-process-safe replication: every process holds the full value
        return jax.tree_util.tree_map(
            lambda l: jax.make_array_from_process_local_data(
                repl, np.asarray(l), np.shape(l)), tree)

    ts = replicate_global(ts)
    # production multi-host feeding: each process supplies its batch shard
    lo, hi = multihost.local_batch_slice(GLOBAL_BATCH)
    batch = multihost.make_global_batch(
        mesh, {"img": g_img[lo:hi], "label": g_lbl[lo:hi]})

    step = jax.jit(make_train_step(model, opt, rng_streams=("reparam",)))
    losses = []
    for _ in range(STEPS):
        ts, m = step(ts, batch)
        losses.append(float(m["loss"]))
    host_params = jax.tree_util.tree_map(
        lambda l: np.asarray(l.addressable_data(0)), ts.params)
    return losses, host_params


def flatten_params(params):
    import jax

    return {jax.tree_util.keystr(p): v for p, v
            in jax.tree_util.tree_leaves_with_path(params)}


def main():
    pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mcgm_tpu.parallel import multihost

    # the production init path, with an explicit coordinator
    multihost.initialize(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    losses, params = train_steps()
    import numpy as np

    np.savez(out_path, losses=np.asarray(losses), **flatten_params(params))


if __name__ == "__main__":
    main()
