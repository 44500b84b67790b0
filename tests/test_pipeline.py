"""Pipeline parallelism (parallel/pipeline.py) on the 8-device virtual CPU
mesh: the GPipe executor must be semantically identical to the sequential
``lax.scan`` it replaces (fwd AND grad), and Glow's pipelined flow stack must
train to the same state as the plain scan. Beyond the reference — its only
distribution is single-process DataParallel (SURVEY §2.10)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from conftest import make_tiny_cfg

from mcgm_tpu.models import build_model
from mcgm_tpu.parallel.pipeline import (get_pipeline_mesh, make_pipe_mesh,
                                        pipeline_scan, set_pipeline_mesh,
                                        shard_stacked_over_pipe)
from mcgm_tpu.train.state import TrainState, make_train_step, split_variables
from mcgm_tpu.train.optim import make_optimizer

K = jax.random.PRNGKey(0)


@pytest.fixture
def pipe_mesh():
    mesh = make_pipe_mesh(n_data=2, n_pipe=4)
    set_pipeline_mesh(mesh)
    yield mesh
    set_pipeline_mesh(None)


def _dense_stack(n=8, d=16, b=24):
    w = jax.random.normal(K, (n, d, d)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (b, d))
    ld = jnp.zeros((b,))
    return w, x, ld


def _body(w, carry):
    x, ld = carry
    y = jnp.tanh(x @ w)
    return y, ld + jnp.sum(jnp.abs(y), axis=-1)


def _seq(w, x, ld):
    def one(c, s):
        return _body(s, c), None
    return jax.lax.scan(one, (x, ld), w)[0]


def test_pipeline_scan_matches_sequential(pipe_mesh):
    w, x, ld = _dense_stack()
    ref = jax.jit(_seq)(w, x, ld)
    for m in (4, 12):  # microbatches = P and > P (smaller bubble share)
        got = jax.jit(lambda w, x, ld, m=m: pipeline_scan(
            _body, w, (x, ld), microbatches=m))(w, x, ld)
        # 1-ulp tolerance: the microbatch shape changes matmul tiling
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                   rtol=0, atol=2e-6)
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   rtol=0, atol=1e-4)


def test_pipeline_scan_grads_match_sequential(pipe_mesh):
    w, x, ld = _dense_stack()

    def loss(fn):
        def f(w):
            y, l = fn(w)
            return jnp.sum(y ** 2) + jnp.sum(l)
        return f

    g_ref = jax.jit(jax.grad(loss(lambda w: _seq(w, x, ld))))(w)
    g_pipe = jax.jit(jax.grad(loss(
        lambda w: pipeline_scan(_body, w, (x, ld)))))(w)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_pipe),
                               rtol=0, atol=1e-4)


def test_pipeline_scan_validations(pipe_mesh):
    w, x, ld = _dense_stack(n=6)  # 6 % 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_scan(_body, w, (x, ld))
    w, x, ld = _dense_stack(n=8, b=20)  # per-shard 10 % 4 != 0
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_scan(_body, w, (x, ld))
    set_pipeline_mesh(None)
    with pytest.raises(ValueError, match="no mesh"):
        pipeline_scan(_body, w, (x, ld))
    set_pipeline_mesh(pipe_mesh)


def test_shard_stacked_over_pipe(pipe_mesh):
    w, _, _ = _dense_stack(n=8)
    tree = {"a": w, "b": jnp.zeros((3,))}
    placed = shard_stacked_over_pipe(pipe_mesh, tree, stack_len=8)
    assert "pipe" in str(placed["a"].sharding.spec)
    assert placed["b"].sharding.is_fully_replicated
    assert get_pipeline_mesh() is pipe_mesh


def _glow_model_pair(scan_chunk=1, k_flows=4):
    kw = dict(data_shape=(8, 8, 3), hidden_size=16, K=k_flows, L=2,
              num_mode=10, controller_rate=0.5, scan_flows=True,
              scan_chunk=scan_chunk)
    from mcgm_tpu.models.glow import MCGlow

    plain = MCGlow(**kw)
    piped = MCGlow(**kw, pipe_axis="pipe")
    b = 8
    batch = {"img": jax.random.uniform(jax.random.PRNGKey(1), (b, 8, 8, 3),
                                       minval=-1, maxval=1),
             "label": jnp.arange(b) % 10}
    rngs = {"params": K, "noise": jax.random.PRNGKey(2), "z": K}
    v = plain.init(rngs, {kk: x[:2] for kk, x in batch.items()}, train=True)
    return plain, piped, v, batch


@pytest.mark.parametrize("scan_chunk", [1, 2])
def test_glow_pipelined_matches_plain(pipe_mesh, scan_chunk):
    """Pipelined MCGlow forward loss is bit-equal to the sequential scan and
    grads match at f32 reassociation noise — including the chunked-scan
    layout (scan_chunk=2: the pipe splits the K/chunk chunk stack)."""
    if scan_chunk == 2:
        # length K/chunk = 2 must divide the pipe size -> use a pipe-2 mesh
        set_pipeline_mesh(make_pipe_mesh(n_data=4, n_pipe=2))
    plain, piped, v, batch = _glow_model_pair(scan_chunk=scan_chunk)

    def loss(model):
        def f(params):
            out = model.apply({**v, "params": params}, batch, train=True,
                              rngs={"noise": jax.random.PRNGKey(3)})
            return out["loss"]
        return f

    la, ga = jax.jit(jax.value_and_grad(loss(plain)))(v["params"])
    lb, gb = jax.jit(jax.value_and_grad(loss(piped)))(v["params"])
    assert float(la) == pytest.approx(float(lb), abs=1e-5)
    flat_a = jax.tree_util.tree_leaves(ga)
    flat_b = jax.tree_util.tree_leaves(gb)
    for a, b2 in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=0, atol=1e-5)


def test_glow_pipelined_train_step_matches_plain(pipe_mesh, tmp_path):
    """Two production train steps (make_train_step + Adam) under the
    (data=2, pipe=4) mesh with flow params PLACED over the pipe axis land on
    the same params as the plain single-device scan."""
    cfg = make_tiny_cfg("mcglow", tmp_dir=str(tmp_path))
    cfg["classes_size"] = 10
    cfg["glow"].update(K=4, scan_flows=True)
    plain_model = build_model(cfg)
    cfg_p = dict(cfg, glow=dict(cfg["glow"], pipe_axis="pipe"))
    piped_model = build_model(cfg_p)

    b = 16
    batch = {"img": jax.random.uniform(K, (b, *cfg["data_shape"]),
                                       minval=-1, maxval=1),
             "label": jnp.arange(b) % 10}
    v = plain_model.init({"params": K, "noise": K, "z": K},
                         {kk: x[:2] for kk, x in batch.items()}, train=True)
    params, state = split_variables(v)
    opt = make_optimizer(cfg, grad_clip=1.0)

    def run(model, place):
        ts = TrainState(params=params, state=state,
                        opt_state=opt.init(params), rng=jax.random.PRNGKey(1))
        feed = batch
        if place:
            ts = shard_stacked_over_pipe(pipe_mesh, ts,
                                         stack_len=cfg["glow"]["K"])
            from jax.sharding import NamedSharding, PartitionSpec as P
            feed = jax.device_put(batch, NamedSharding(pipe_mesh, P("data")))
        step = jax.jit(make_train_step(model, opt, rng_streams=("noise",)))
        for _ in range(2):
            ts, aux = step(ts, feed)
        return ts, aux

    ts_a, aux_a = run(plain_model, place=False)
    ts_b, aux_b = run(piped_model, place=True)
    assert np.isfinite(float(aux_b["loss"]))
    assert float(aux_a["loss"]) == pytest.approx(float(aux_b["loss"]),
                                                 abs=1e-5)
    for a, b2 in zip(jax.tree_util.tree_leaves(ts_a.params),
                     jax.tree_util.tree_leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                   rtol=0, atol=2e-5)


def test_experiment_runs_under_pipe_mesh(tmp_path):
    """Production path: Experiment on a (data=4, pipe=2) mesh auto-enables
    glow's pipelined flow stacks (train/loop.py) — DDI, training, eval, and
    checkpointing all run, and the trained run matches a single-device run
    at DP-equivalence tolerance."""
    from mcgm_tpu.train.loop import Experiment

    def run(mesh_arg, sub):
        cfg = make_tiny_cfg("mcglow", tmp_dir=str(tmp_path / sub))
        cfg["glow"].update(K=4, scan_flows=True)
        exp = Experiment(cfg, mesh=mesh_arg)
        exp.run()
        return exp

    single = run(None, "single")
    pp = run(make_pipe_mesh(n_data=4, n_pipe=2), "pp")
    set_pipeline_mesh(None)
    la = jax.tree_util.tree_leaves(single.ts.params)
    lb = jax.tree_util.tree_leaves(pp.ts.params)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-3, rtol=5e-3)


def test_experiment_pipe_mesh_rejects_non_glow(tmp_path):
    from mcgm_tpu.train.loop import Experiment

    cfg = make_tiny_cfg("mcvae", tmp_dir=str(tmp_path))
    exp = Experiment(cfg, mesh=make_pipe_mesh(n_data=4, n_pipe=2))
    with pytest.raises(ValueError, match="glow family only"):
        exp.setup()
    set_pipeline_mesh(None)
