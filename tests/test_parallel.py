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


# ------------------------------------------------------ tensor parallelism
@pytest.fixture(scope="module")
def tp_mesh():
    return make_mesh(n_data=4, n_model=2)


def test_tp_param_placement(tp_mesh):
    """shard_params puts big trailing-axis leaves on the model axis and
    leaves small leaves (biases, BN stats) replicated; each device holds
    1/n_model of a sharded kernel."""
    from mcgm_tpu.parallel import shard_params

    cfg, model, ts, step, batch = _setup()
    ts_tp = shard_params(tp_mesh, ts, min_elements=64)

    def on_model_axis(l):
        return any(ax == "model" for ax in tuple(l.sharding.spec))

    sharded = [l for l in jax.tree_util.tree_leaves(ts_tp.params)
               if on_model_axis(l)]
    assert sharded, "no parameter was tensor-sharded"
    k = max(sharded, key=lambda l: l.size)
    shard_shape = k.addressable_shards[0].data.shape
    assert shard_shape[-1] == k.shape[-1] // 2  # halved over model axis
    small = [l for l in jax.tree_util.tree_leaves(ts_tp.params) if l.size < 64]
    assert all(l.sharding.is_fully_replicated for l in small)


def test_tp_step_matches_single_device(tp_mesh):
    """One dp×tp train step reproduces the single-device step (XLA inserts
    the model-axis collectives; math is the same up to reduction order)."""
    from mcgm_tpu.parallel import (shard_params, state_shardings,
                                   with_state_shardings)

    cfg, model, ts, step, batch = _setup()
    ts_single, aux_single = jax.jit(step)(ts, batch)

    cfg, model, ts2, step2, _ = _setup()
    ts_tp = shard_params(tp_mesh, ts2, min_elements=64)
    step_tp = with_state_shardings(step2, state_shardings(ts_tp))
    ts_tp2, aux_tp = jax.jit(step_tp)(ts_tp, shard_batch(tp_mesh, batch))
    assert abs(float(aux_single["loss"]) - float(aux_tp["loss"])) < 1e-4
    # updated params stay in their TP placement (the constraint held)
    flat1, _ = jax.tree_util.tree_flatten(ts_tp.params)
    flat2, _ = jax.tree_util.tree_flatten(ts_tp2.params)
    for before, after in zip(flat1, flat2):
        assert before.sharding == after.sharding
    p1 = jax.tree_util.tree_leaves(ts_single.params)
    p2 = jax.tree_util.tree_leaves(ts_tp2.params)
    for a, b in zip(p1, p2):
        # partitioned matmuls change fp reduction order; Adam's 1/sqrt(nu)
        # amplifies that near init — 1e-3 bounds it comfortably in f32
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_experiment_runs_under_tp_mesh(tp_mesh, tmp_path):
    from mcgm_tpu.train.loop import Experiment

    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path))
    cfg["tp_min_elements"] = 64  # tiny model: force real sharding
    exp = Experiment(cfg, mesh=tp_mesh)
    logger = exp.run()
    assert np.isfinite(logger.history["train/Loss"][-1])


def test_padded_eval_metrics_match_unpadded(mesh):
    """Exact eval under SPMD padding (VERDICT r2 weak #4): a padded mesh
    loader (final batch tiled to the SPMD shape, 'w' validity mask) must
    produce EXACTLY the metrics of an unpadded single-device sweep — the
    mask drops padded rows from every loss/metric mean, and the logger's
    true-n weighting recovers the global per-sample mean."""
    from mcgm_tpu.data.loader import DataLoader
    from mcgm_tpu.evals.metrics import make_device_metrics
    from mcgm_tpu.train.state import make_eval_step, merge_variables

    cfg = make_tiny_cfg("vqvae")
    cfg["classes_size"] = 10
    model = build_model(cfg)
    n, bs = 20, 8  # 8, 8, 4 -> padded final batch under mesh
    rng = np.random.default_rng(7)

    class _DS:
        img = rng.integers(0, 256, (n, *cfg["data_shape"]), dtype=np.int64
                           ).astype(np.uint8)
        labels = (np.arange(n) % 10).astype(np.int64)

        def __len__(self):
            return n

    ds = _DS()
    batch0 = {"img": jnp.zeros((2, *cfg["data_shape"]), jnp.float32),
              "label": jnp.zeros((2,), jnp.int32)}
    v = model.init({"params": K}, batch0, train=True)
    from mcgm_tpu.train.state import split_variables as _split
    params, state = _split(v)
    ev = jax.jit(make_eval_step(model))
    metrics_fn = make_device_metrics(["Loss", "MSE", "PSNR"])

    def sweep(loader):
        tot, wsum = {}, 0.0
        for batch in loader:
            n_i = batch["n"]
            b = {k: val for k, val in batch.items() if k != "n"}
            out = ev(params, state, b, K)
            m = metrics_fn(b, out)
            for k, val in m.items():
                tot[k] = tot.get(k, 0.0) + float(val) * n_i
            wsum += n_i
        return {k: val / wsum for k, val in tot.items()}

    plain = sweep(DataLoader(ds, bs, shuffle=False))
    padded = sweep(DataLoader(ds, bs, shuffle=False, pad_to_batch=True,
                              sharding=data_sharding(mesh)))
    assert plain.keys() == padded.keys()
    for k in plain:
        assert abs(plain[k] - padded[k]) < 1e-5, (k, plain[k], padded[k])


def test_vqvae_dp_training_matches_single_device(mesh, tmp_path):
    """N-epoch DP equivalence for the stateful-collection-heavy family
    (VERDICT r2 weak #5): 2 full Experiment epochs of vqvae — BatchNorm
    batch stats + VQ-EMA cluster/embedding state — on the 8-device mesh and
    on a single device from the same seed must land in the same final state
    (global-view jit makes EMA/BN global-batch quantities; only fp reduction
    order may differ)."""
    from mcgm_tpu.train.loop import Experiment

    def run(mesh_arg, sub):
        cfg = make_tiny_cfg("vqvae", tmp_dir=str(tmp_path / sub))
        cfg["num_epochs"] = 2
        exp = Experiment(cfg, mesh=mesh_arg)
        exp.run()
        return exp

    single = run(None, "single")
    dp = run(mesh, "dp8")
    for name, a, b in [("params", single.ts.params, dp.ts.params),
                       ("state", single.ts.state, dp.ts.state),
                       ("opt_state", single.ts.opt_state, dp.ts.opt_state)]:
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves_with_path(b)
        assert [jax.tree_util.keystr(p) for p, _ in la] == \
               [jax.tree_util.keystr(p) for p, _ in lb]
        for (p, x), (_, y) in zip(la, lb):
            # tolerance: per-step grad deltas are ~1e-7 (fp reduction order),
            # but Adam's 1/sqrt(nu) near init amplifies direction noise;
            # 2e-3 absolute bounds the 2-epoch drift comfortably while still
            # catching any real cross-replica EMA/BN bug (those diverge by
            # O(1) immediately)
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-3, rtol=5e-3,
                err_msg=f"{name}{jax.tree_util.keystr(p)}")


def test_gan_dp_training_matches_single_device(mesh, tmp_path):
    """GAN closes the stateful-family DP matrix (vqvae: VQ-EMA, glow: DDI,
    gan: spectral-norm power-iteration vectors + dual optimizers + BN inside
    a scanned 5:1 step — reference train_gan.py:139-176). 2 Experiment
    epochs on DP8 vs single device from one seed must land in the same
    final generator/discriminator params, SN/BN state, and both opt states."""
    from mcgm_tpu.train.loop import Experiment

    def run(mesh_arg, sub):
        cfg = make_tiny_cfg("mcgan", tmp_dir=str(tmp_path / sub))
        cfg["num_epochs"] = 2
        exp = Experiment(cfg, mesh=mesh_arg)
        exp.run()
        return exp

    single = run(None, "single")
    dp = run(mesh, "dp8")
    pairs = [("g_params", single.ts.g_params, dp.ts.g_params),
             ("d_params", single.ts.d_params, dp.ts.d_params),
             ("state", single.ts.state, dp.ts.state),
             ("g_opt_state", single.ts.g_opt_state, dp.ts.g_opt_state),
             ("d_opt_state", single.ts.d_opt_state, dp.ts.d_opt_state)]
    for name, a, b in pairs:
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves_with_path(b)
        assert [jax.tree_util.keystr(p) for p, _ in la] == \
               [jax.tree_util.keystr(p) for p, _ in lb]
        for (p, x), (_, y) in zip(la, lb):
            # same tolerance rationale as the vqvae test; a per-replica SN-u
            # or BN bug would diverge by O(1) within one epoch
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-3, rtol=5e-3,
                err_msg=f"{name}{jax.tree_util.keystr(p)}")


def test_glow_dp_training_matches_single_device(mesh, tmp_path):
    """Glow is the other stateful sharp case: data-dependent ActNorm init
    (_run_ddi gathers the first n train batches — sharded under the mesh —
    and standardizes on GLOBAL stats), untrained glow_const, and NaN-masked
    losses. 2 Experiment epochs on DP8 vs single device from one seed must
    land in the same final state."""
    from mcgm_tpu.train.loop import Experiment

    def run(mesh_arg, sub):
        cfg = make_tiny_cfg("mcglow", tmp_dir=str(tmp_path / sub))
        cfg["num_epochs"] = 2
        exp = Experiment(cfg, mesh=mesh_arg)
        exp.run()
        return exp

    single = run(None, "single")
    dp = run(mesh, "dp8")
    for name, a, b in [("params", single.ts.params, dp.ts.params),
                       ("state", single.ts.state, dp.ts.state),
                       ("opt_state", single.ts.opt_state, dp.ts.opt_state)]:
        la = jax.tree_util.tree_leaves_with_path(a)
        lb = jax.tree_util.tree_leaves_with_path(b)
        assert [jax.tree_util.keystr(p) for p, _ in la] == \
               [jax.tree_util.keystr(p) for p, _ in lb]
        for (p, x), (_, y) in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-3, rtol=5e-3,
                err_msg=f"{name}{jax.tree_util.keystr(p)}")
