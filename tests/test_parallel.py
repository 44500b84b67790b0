"""Data-parallel SPMD tests on the 8-device virtual CPU mesh — the TPU-world
substitute for multi-chip tests (SURVEY.md §2.10: the reference's only
parallelism is torch DataParallel; here DP = mesh + sharded batch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.models import build_model
from mcgm_tpu.parallel import data_sharding, make_mesh, replicate, shard_batch
from mcgm_tpu.train.optim import make_optimizer
from mcgm_tpu.train.state import TrainState, make_train_step, split_variables

K = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


def _setup(model_name="mcvae"):
    cfg = make_tiny_cfg(model_name)
    cfg["classes_size"] = 10
    model = build_model(cfg)
    batch = {
        "img": jax.random.uniform(K, (16, *cfg["data_shape"]), minval=-1, maxval=1),
        "label": jnp.arange(16) % 10,
    }
    v = model.init({"params": K, "reparam": K}, batch, train=True)
    params, state = split_variables(v)
    opt = make_optimizer(cfg, grad_clip=1.0)
    ts = TrainState(params=params, state=state, opt_state=opt.init(params),
                    rng=jax.random.PRNGKey(1))
    step = make_train_step(model, opt, rng_streams=("reparam",))
    return cfg, model, ts, step, batch


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")


def test_dp_step_executes_and_shards(mesh):
    cfg, model, ts, step, batch = _setup()
    ts = replicate(mesh, ts)
    sbatch = shard_batch(mesh, batch)
    assert sbatch["img"].sharding.spec == data_sharding(mesh).spec
    jstep = jax.jit(step)
    ts2, aux = jstep(ts, sbatch)
    assert np.isfinite(float(aux["loss"]))
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(ts2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dp_matches_single_device(mesh):
    """Global-view DP step must produce the same loss/params as 1 device."""
    cfg, model, ts, step, batch = _setup()
    jstep = jax.jit(step)
    ts_single, aux_single = jstep(ts, batch)

    cfg, model, ts2, step2, _ = _setup()
    ts2 = replicate(mesh, ts2)
    sbatch = shard_batch(mesh, batch)
    ts_dp, aux_dp = jax.jit(step2)(ts2, sbatch)
    assert abs(float(aux_single["loss"]) - float(aux_dp["loss"])) < 1e-4
    p1 = jax.tree_util.tree_leaves(ts_single.params)[0]
    p2 = jax.tree_util.tree_leaves(ts_dp.params)[0]
    assert np.allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_experiment_runs_under_mesh(mesh, tmp_path):
    from mcgm_tpu.train.loop import Experiment

    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path))
    exp = Experiment(cfg, mesh=mesh)
    logger = exp.run()
    assert np.isfinite(logger.history["train/Loss"][-1])
