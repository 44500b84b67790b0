"""Reversible-backprop flow stacks (ops/reversible.py): same math as
grad-of-scan, no carry saves.

The custom VJP reconstructs each flow's input from its output via the
inverse; these tests pin (1) forward equality with the nn.scan path,
(2) gradient equality with autodiff-through-scan at f32 reconstruction
tolerance, for MCGlow, CGlow, and the additive (affine=False) coupling,
(3) that the guarded flag combinations fail fast.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.models.glow import CGlow, MCGlow

K = jax.random.PRNGKey(0)


def _models(cls, **kw):
    base = dict(data_shape=(16, 16, 3), hidden_size=16, K=3, L=2,
                scan_flows=True)
    if cls is MCGlow:
        base.update(num_mode=6, controller_rate=0.5)
    else:
        base.update(num_mode=6)
    base.update(kw)
    m_scan = cls(**base)
    m_rev = cls(**base, reversible_flows=True)
    img = jax.random.uniform(K, (2, 16, 16, 3), minval=-1, maxval=1)
    lbl = jnp.array([0, 4])
    batch = {"img": img, "label": lbl}
    v = m_scan.init({"params": K, "noise": K}, batch, train=True)
    return m_scan, m_rev, v, batch


@pytest.mark.parametrize("cls", [MCGlow, CGlow])
def test_reversible_matches_scan_loss_and_grads(cls):
    m_scan, m_rev, v, batch = _models(cls)
    rngs = {"noise": jax.random.PRNGKey(7)}
    l_scan = m_scan.apply(v, batch, train=False, rngs=rngs)["loss"]
    l_rev = m_rev.apply(v, batch, train=False, rngs=rngs)["loss"]
    # identical composition of the same primitives — tight tolerance
    assert abs(float(l_scan) - float(l_rev)) < 1e-5

    def loss(m):
        def f(p):
            return m.apply({**v, "params": p}, batch, train=True,
                           rngs=rngs)["loss"]
        return f

    g_scan = jax.grad(loss(m_scan))(v["params"])
    g_rev = jax.grad(loss(m_rev))(v["params"])
    flat_s = jax.tree_util.tree_leaves_with_path(g_scan)
    flat_r = {jax.tree_util.keystr(p): x
              for p, x in jax.tree_util.tree_leaves_with_path(g_rev)}
    assert len(flat_s) == len(flat_r)
    for p, a in flat_s:
        b = flat_r[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
            err_msg=jax.tree_util.keystr(p))


def test_reversible_additive_coupling():
    m_scan, m_rev, v, batch = _models(MCGlow, affine=False)
    rngs = {"noise": jax.random.PRNGKey(3)}
    l_scan = m_scan.apply(v, batch, train=False, rngs=rngs)["loss"]
    l_rev = m_rev.apply(v, batch, train=False, rngs=rngs)["loss"]
    assert abs(float(l_scan) - float(l_rev)) < 1e-5

    def f(m, p):
        return m.apply({**v, "params": p}, batch, train=True, rngs=rngs)["loss"]

    g_scan = jax.grad(lambda p: f(m_scan, p))(v["params"])
    g_rev = jax.grad(lambda p: f(m_rev, p))(v["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
        g_scan, g_rev)


def test_reversible_ddi_and_generate_use_scan_paths():
    """DDI (mutable params) and generate/reverse stay on the nn.scan
    executors — they must still work on a reversible-configured model."""
    m_scan, m_rev, v, batch = _models(MCGlow)
    _, mut = m_rev.apply(v, batch, train=True, ddi=True,
                         rngs={"noise": K}, mutable=["params"])
    v2 = {**v, "params": mut["params"]}
    out = m_rev.apply(v2, batch, train=False, rngs={"noise": K})
    assert np.isfinite(float(out["loss"]))
    gen = m_rev.apply(v2, batch["label"], method="generate", rngs={"z": K})
    assert np.isfinite(np.asarray(gen)).all()


def test_reversible_flag_guards():
    with pytest.raises(ValueError, match="scan_flows"):
        MCGlow((16, 16, 3), hidden_size=16, K=2, L=2, num_mode=4,
               scan_flows=False, reversible_flows=True).init(
            {"params": K, "noise": K},
            {"img": jnp.zeros((1, 16, 16, 3)), "label": jnp.zeros((1,), jnp.int32)},
            train=True)
    with pytest.raises(ValueError, match="scan_chunk"):
        MCGlow((16, 16, 3), hidden_size=16, K=2, L=2, num_mode=4,
               scan_flows=True, scan_chunk=2, reversible_flows=True).init(
            {"params": K, "noise": K},
            {"img": jnp.zeros((1, 16, 16, 3)), "label": jnp.zeros((1,), jnp.int32)},
            train=True)


def test_reversible_flag_reaches_model_through_experiment():
    """The top-level ``reversible_flows`` config key (config.yml, CLI mirror)
    must reach the built model — Experiment merges it into cfg['glow'] after
    process_control's rebuild (which would otherwise clobber a hand-set
    nested key; same plumbing as pipe_size/spatial_size)."""
    from conftest import make_tiny_cfg
    from mcgm_tpu.train.loop import Experiment

    cfg = make_tiny_cfg("mcglow", tmp_dir="/tmp/mcgm_rev_cfg")
    cfg["glow"] = dict(cfg["glow"], scan_flows=True, K=2, L=2)
    cfg["reversible_flows"] = True
    exp = Experiment(cfg)
    exp.setup()
    assert exp.model.reversible_flows is True
    # and the default stays off
    cfg2 = make_tiny_cfg("mcglow", tmp_dir="/tmp/mcgm_rev_cfg")
    cfg2["glow"] = dict(cfg2["glow"], scan_flows=True, K=2, L=2)
    exp2 = Experiment(cfg2)
    exp2.setup()
    assert exp2.model.reversible_flows is False


def test_reversible_dp_matches_single_device():
    """The custom-VJP reversible scan composes with mesh data parallelism:
    a DP8-sharded train step lands on the same loss and gradients as the
    single-device step (the custom backward's reconstruction chain and
    param-cotangent stacking are per-sample, so the SPMD partitioner only
    adds the usual grad psums)."""
    from mcgm_tpu.parallel import make_mesh, replicate, shard_batch

    assert len(jax.devices()) == 8
    mesh = make_mesh()
    m = MCGlow((16, 16, 3), hidden_size=16, K=3, L=2, num_mode=6,
               controller_rate=0.5, scan_flows=True, reversible_flows=True)
    img = jax.random.uniform(K, (16, 16, 16, 3), minval=-1, maxval=1)
    lbl = jnp.arange(16) % 6
    batch = {"img": img, "label": lbl}
    v = m.init({"params": K, "noise": K}, batch, train=True)
    rngs = {"noise": jax.random.PRNGKey(7)}

    def loss(p, b):
        return m.apply({**v, "params": p}, b, train=True, rngs=rngs)["loss"]

    l1, g1 = jax.value_and_grad(loss)(v["params"], batch)
    v_r = replicate(mesh, v)
    l8, g8 = jax.jit(jax.value_and_grad(loss))(
        v_r["params"], shard_batch(mesh, batch))
    assert abs(float(l1) - float(l8)) < 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
        g1, g8)
