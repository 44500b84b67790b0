"""Spatial partitioning on the 8-device virtual CPU mesh: images sharded
over BOTH batch (``data``) and height (``spatial``) axes, with XLA's SPMD
partitioner inserting the conv halo exchanges and globalizing BN statistics.
The image-model analog of sequence parallelism (SURVEY §5.7); beyond the
reference (DataParallel only, §2.10). Pure annotation — the model code and
train step are byte-identical to single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import make_tiny_cfg

from mcgm_tpu.models import build_model
from mcgm_tpu.parallel import (make_spatial_mesh, replicate,
                               shard_batch_spatial)
from mcgm_tpu.train.optim import make_optimizer
from mcgm_tpu.train.state import (GANTrainState, TrainState, make_gan_train_step,
                                  make_train_step, split_variables)

K = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def sp_mesh():
    return make_spatial_mesh(n_data=2, n_spatial=4)


def _batch(cfg, b=16):
    return {
        "img": jax.random.uniform(K, (b, *cfg["data_shape"]),
                                  minval=-1, maxval=1),
        "label": jnp.arange(b) % 10,
    }


def test_spatial_mesh_and_placement(sp_mesh):
    assert sp_mesh.axis_names == ("data", "spatial")
    cfg = make_tiny_cfg("mcvae")
    sb = shard_batch_spatial(sp_mesh, _batch(cfg))
    assert tuple(sb["img"].sharding.spec) == ("data", "spatial")
    assert tuple(sb["label"].sharding.spec) == ("data",)


def test_vae_spatial_step_matches_single_device(sp_mesh):
    """BN is the sharp case: batch statistics reduce over (B, H, W), which
    under sp spans BOTH mesh axes — the updated running stats must equal the
    single-device step's. Losses compare exactly-ish; grads at reassociation
    noise (post-Adam params are sign-noise amplified on near-zero grads, so
    the equality is asserted pre-optimizer)."""
    cfg = make_tiny_cfg("mcvae")
    cfg["classes_size"] = 10
    model = build_model(cfg)
    batch = _batch(cfg)
    v = model.init({"params": K, "reparam": K}, batch, train=True)
    params, state = split_variables(v)
    opt = make_optimizer(cfg, grad_clip=1.0)
    step = make_train_step(model, opt, rng_streams=("reparam",))

    def mk():
        return TrainState(params=params, state=state,
                          opt_state=opt.init(params),
                          rng=jax.random.PRNGKey(1))

    ts1, aux1 = jax.jit(step)(mk(), batch)
    ts2, aux2 = jax.jit(step)(replicate(sp_mesh, mk()),
                              shard_batch_spatial(sp_mesh, batch))
    assert float(aux1["loss"]) == pytest.approx(float(aux2["loss"]),
                                                abs=1e-5)
    # BN running stats (mutable state) must match: spatial reductions were
    # globalized correctly by the partitioner
    for a, b in zip(jax.tree_util.tree_leaves(ts1.state),
                    jax.tree_util.tree_leaves(ts2.state)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0, atol=1e-5)


def test_vae_spatial_grads_match_single_device(sp_mesh):
    cfg = make_tiny_cfg("mcvae")
    cfg["classes_size"] = 10
    model = build_model(cfg)
    batch = _batch(cfg)
    v = model.init({"params": K, "reparam": K}, batch, train=True)
    params, state = split_variables(v)

    def loss_fn(p, feed):
        out = model.apply({"params": p, **state}, feed, train=True,
                          rngs={"reparam": jax.random.PRNGKey(7)},
                          mutable=list(state.keys()))
        return out[0]["loss"]

    g1 = jax.jit(jax.grad(loss_fn))(params, batch)
    g2 = jax.jit(jax.grad(loss_fn))(replicate(sp_mesh, params),
                                    shard_batch_spatial(sp_mesh, batch))
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g1))
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5 * max(scale, 1.0))


def test_gan_spatial_step_executes(sp_mesh):
    """The fused 5:1 GAN step (spectral norm, BN, dual optimizers, scanned
    D updates) compiles and runs under sp with finite losses — the
    upsampled (lhs-dilated) generator convs are the partitioner's hardest
    case here."""
    cfg = make_tiny_cfg("mcgan")
    cfg["classes_size"] = 10
    model = build_model(cfg)
    batch = _batch(cfg)
    v = model.init({"params": K, "z": K}, batch, train=True)
    params, state = split_variables(v)
    gcfg = {"optimizer_name": "Adam", "lr": 2e-4, "weight_decay": 0}
    g_opt = make_optimizer(gcfg, 2e-4, (0.5, 0.999))
    d_opt = make_optimizer(gcfg, 2e-4, (0.5, 0.999))
    ts = GANTrainState(
        g_params=params["generator"], d_params=params["discriminator"],
        state=state, g_opt_state=g_opt.init(params["generator"]),
        d_opt_state=d_opt.init(params["discriminator"]),
        rng=jax.random.PRNGKey(1))
    step = jax.jit(make_gan_train_step(model, g_opt, d_opt,
                                       d_iter=cfg["d_iter"]))
    ts2, m = step(replicate(sp_mesh, ts), shard_batch_spatial(sp_mesh, batch))
    assert np.isfinite(float(m["Loss_D"])) and np.isfinite(float(m["Loss_G"]))


def test_experiment_runs_under_spatial_mesh(tmp_path):
    """Production path: Experiment on a (data=4, spatial=2) mesh shards
    image batches over batch AND height via the loader's per-leaf rule
    (``parallel.spatial_data_sharding``) — training, exact padded eval, and
    checkpointing all run, and the trained run matches a single-device run
    at DP-equivalence tolerance (pure annotation: same step bytes)."""
    from mcgm_tpu.parallel import make_spatial_mesh
    from mcgm_tpu.train.loop import Experiment

    def run(mesh_arg, sub):
        cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path / sub))
        exp = Experiment(cfg, mesh=mesh_arg)
        exp.run()
        return exp

    single = run(None, "single")
    sp = run(make_spatial_mesh(n_data=4, n_spatial=2), "sp")
    la = jax.tree_util.tree_leaves(single.ts.params)
    lb = jax.tree_util.tree_leaves(sp.ts.params)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-3, rtol=5e-3)


def test_run_experiments_carves_spatial_mesh(monkeypatch, tmp_path):
    """``spatial_size: 2`` in the config makes run_experiments build the
    (data = world/spatial, spatial) mesh, exactly like model_size (tp) and
    pipe_size (pp) carve theirs."""
    import mcgm_tpu.train.loop as loop_mod

    seen = {}

    class _Capture:
        def __init__(self, cfg, seed=0, mesh=None):
            seen["mesh"] = mesh
            self.tag = "capture"

        def run(self, num_epochs=None):
            return {}

    monkeypatch.setattr(loop_mod, "Experiment", _Capture)
    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path))
    cfg.update(world_size=8, spatial_size=2)
    loop_mod.run_experiments(cfg)
    mesh = seen["mesh"]
    assert mesh.axis_names == ("data", "spatial")
    assert mesh.shape["data"] == 4 and mesh.shape["spatial"] == 2

    cfg.update(model_size=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        loop_mod.run_experiments(cfg)
