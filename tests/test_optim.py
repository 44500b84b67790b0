"""Scheduler math and optimizer coverage (reference train_vae.py:150-189)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.train.optim import (Scheduler, get_learning_rate,
                                  make_optimizer, set_learning_rate)


def _sched(name, **over):
    cfg = dict(scheduler_name=name, lr=1.0, step_size=2, milestones=[3, 5],
               factor=0.5, patience=1, threshold=1e-3, min_lr=1e-3,
               num_epochs=10)
    cfg.update(over)
    return Scheduler(cfg)


def test_step_lr():
    s = _sched("StepLR")
    lrs = [s.step() for _ in range(4)]
    assert lrs == [1.0, 0.5, 0.5, 0.25]


def test_multistep_lr():
    s = _sched("MultiStepLR")
    lrs = [s.step() for _ in range(6)]
    assert lrs == [1.0, 1.0, 0.5, 0.5, 0.25, 0.25]


def test_exponential_lr():
    s = _sched("ExponentialLR")
    assert abs(s.step() - 0.99) < 1e-12
    assert abs(s.step() - 0.99**2) < 1e-12


def test_cosine_lr():
    s = _sched("CosineAnnealingLR")
    for _ in range(10):
        last = s.step()
    assert abs(last - 0.0) < 1e-9  # cos(pi) at T_max


def test_plateau_respects_min_lr():
    s = _sched("ReduceLROnPlateau", patience=0)
    for _ in range(30):
        s.step(1.0)  # never improves
    assert abs(s.lr - 1e-3) < 1e-12


def test_plateau_max_mode():
    """plateau_mode='max' reduces only when the metric stops rising
    (torch ReduceLROnPlateau mode='max', threshold_mode='rel')."""
    s = _sched("ReduceLROnPlateau", patience=0, plateau_mode="max")
    lr0 = s.lr
    s.step(1.0)
    s.step(2.0)  # improving -> hold
    assert s.lr == lr0
    s.step(2.0)
    s.step(2.0)  # plateaued past patience -> reduce
    assert s.lr < lr0


def test_none_scheduler_constant():
    s = _sched("None")
    assert all(s.step() == 1.0 for _ in range(3))


def test_set_learning_rate_roundtrip():
    cfg = dict(optimizer_name="Adam", lr=1e-3, weight_decay=0)
    opt = make_optimizer(cfg)
    params = {"w": jnp.zeros((3,))}
    state = opt.init(params)
    assert abs(get_learning_rate(state) - 1e-3) < 1e-9  # f32
    state2 = set_learning_rate(state, 5e-4)
    assert abs(get_learning_rate(state2) - 5e-4) < 1e-9
    # the new lr actually drives updates
    g = {"w": jnp.ones((3,))}
    upd, _ = opt.update(g, state2, params)
    assert np.isfinite(np.asarray(upd["w"])).all()


@pytest.mark.parametrize("name", ["SGD", "RMSprop", "Adam", "Adamax"])
def test_all_optimizers_step(name):
    cfg = dict(optimizer_name=name, lr=1e-2, momentum=0.9, weight_decay=1e-4)
    opt = make_optimizer(cfg, grad_clip=1.0)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    g = {"w": jnp.full((4,), 2.0)}
    upd, state = opt.update(g, state, params)
    new = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    assert float(new["w"][0]) < 1.0  # moved against the gradient


def test_gan_bce_loss_variant():
    """loss_type='BCE' (reference train_gan.py:148-152, 168-170) compiles+runs."""
    from mcgm_tpu.models.gan import MCGAN
    from mcgm_tpu.train.state import GANTrainState, make_gan_train_step, split_variables

    K = jax.random.PRNGKey(0)
    model = MCGAN((32, 32, 3), 8, (8,) * 4, (8,) * 4, 4, 0.5)
    batch = {"img": jax.random.uniform(K, (8, 32, 32, 3), minval=-1, maxval=1),
             "label": jnp.arange(8) % 4}
    v = model.init({"params": K, "z": K}, batch, train=True)
    params, state = split_variables(v)
    cfg = dict(optimizer_name="Adam", lr=2e-4, weight_decay=0)
    g_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    d_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    ts = GANTrainState(params["generator"], params["discriminator"], state,
                       g_opt.init(params["generator"]),
                       d_opt.init(params["discriminator"]), jax.random.PRNGKey(1))
    step = make_gan_train_step(model, g_opt, d_opt, d_iter=1, loss_type="BCE")
    ts, m = step(ts, batch)
    assert np.isfinite(float(m["Loss_D"]))
    assert np.isfinite(float(m["Loss_G"]))


def test_remat_matches_plain_gradients():
    """cfg['remat'] (jax.checkpoint around the loss) must change memory, not
    math: one train step with and without remat yields identical losses and
    parameters (the 128px memory lever — docs/DESIGN.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_tiny_cfg
    from mcgm_tpu.models import build_model
    from mcgm_tpu.train.optim import make_optimizer
    from mcgm_tpu.train.state import (GANTrainState, TrainState, jit_init,
                                      make_gan_train_step, make_train_step,
                                      split_variables)

    K = jax.random.PRNGKey(0)
    # generic family (mcvae)
    cfg = make_tiny_cfg("mcvae")
    cfg["classes_size"] = 10
    model = build_model(cfg)
    batch = {"img": jax.random.uniform(K, (8, *cfg["data_shape"]),
                                       minval=-1, maxval=1),
             "label": jnp.arange(8) % 10}
    v = model.init({"params": K, "reparam": K}, batch, train=True)
    params, state = split_variables(v)
    opt = make_optimizer(cfg, grad_clip=1.0)
    outs = []
    for remat in (False, True):
        ts = TrainState(params=params, state=state,
                        opt_state=opt.init(params), rng=jax.random.PRNGKey(1))
        step = jax.jit(make_train_step(model, opt, rng_streams=("reparam",),
                                       remat=remat))
        ts2, aux = step(ts, batch)
        outs.append((float(aux["loss"]), ts2.params))
    assert outs[0][0] == outs[1][0]
    for a, b in zip(jax.tree_util.tree_leaves(outs[0][1]),
                    jax.tree_util.tree_leaves(outs[1][1])):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # gan family
    cfg = make_tiny_cfg("mcgan")
    cfg["classes_size"] = 10
    model = build_model(cfg)
    batch = {"img": jax.random.uniform(K, (8, 32, 32, 3), minval=-1, maxval=1),
             "label": jnp.arange(8) % 10}
    v = jit_init(model, {"params": K, "z": K}, batch, train=True)
    params, state = split_variables(v)
    g_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    d_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    res = []
    for remat in (False, True):
        ts = GANTrainState(
            g_params=params["generator"], d_params=params["discriminator"],
            state=state, g_opt_state=g_opt.init(params["generator"]),
            d_opt_state=d_opt.init(params["discriminator"]),
            rng=jax.random.PRNGKey(2))
        step = jax.jit(make_gan_train_step(model, g_opt, d_opt, d_iter=2,
                                           remat=remat))
        ts2, m = step(ts, batch)
        res.append((float(m["Loss_D"]), float(m["Loss_G"]), ts2.g_params))
    assert res[0][:2] == res[1][:2]
    for a, b in zip(jax.tree_util.tree_leaves(res[0][2]),
                    jax.tree_util.tree_leaves(res[1][2])):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_g_pass_matches_sequential():
    """fuse_g_pass (one vmapped batch-k*B G forward feeding the D-scan)
    must reproduce the sequential path exactly: same z chain, same fakes
    (train-mode BN reads batch stats only), same losses/params; BN running
    stats re-chained algebraically (fp-identical up to ~1e-6)."""
    from mcgm_tpu.models.gan import MCGAN
    from mcgm_tpu.train.state import (GANTrainState, jit_init,
                                      make_gan_train_step, split_variables)

    K = jax.random.PRNGKey(0)
    model = MCGAN((32, 32, 3), 8, (8,) * 4, (8,) * 4, 4, 0.5)
    batch = {"img": jax.random.uniform(K, (8, 32, 32, 3), minval=-1, maxval=1),
             "label": jnp.arange(8) % 4}
    v = jit_init(model, {"params": K, "z": K}, batch, train=True)
    params, state = split_variables(v)
    cfg = dict(optimizer_name="Adam", lr=2e-4, weight_decay=0)
    g_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    d_opt = make_optimizer(cfg, 2e-4, (0.5, 0.999))
    outs = []
    for fused in (False, True):
        ts = GANTrainState(params["generator"], params["discriminator"], state,
                           g_opt.init(params["generator"]),
                           d_opt.init(params["discriminator"]),
                           jax.random.PRNGKey(7))
        # unroll >= d_iter: CPU-friendly trace-level unroll covers both paths
        step = jax.jit(make_gan_train_step(model, g_opt, d_opt, d_iter=3,
                                           unroll=3, fuse_g_pass=fused))
        ts2, m = step(ts, batch)
        outs.append((m, ts2))
    m0, ts_a = outs[0]
    m1, ts_b = outs[1]
    assert abs(float(m0["Loss_D"]) - float(m1["Loss_D"])) < 1e-5
    assert abs(float(m0["Loss_G"]) - float(m1["Loss_G"])) < 1e-5
    assert np.array_equal(np.asarray(ts_a.rng), np.asarray(ts_b.rng))
    for name, a, b in [("g", ts_a.g_params, ts_b.g_params),
                       ("d", ts_a.d_params, ts_b.d_params),
                       ("state", ts_a.state, ts_b.state)]:
        for (p, x), (_, y) in zip(
                jax.tree_util.tree_leaves_with_path(a),
                jax.tree_util.tree_leaves_with_path(b)):
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=2e-5,
                err_msg=f"{name}{jax.tree_util.keystr(p)}")


def test_lr_warmup_steps_scales_updates():
    """make_optimizer(lr_warmup_steps=N): updates ramp linearly (1/N, 2/N,
    ..., 1) and the schedule composes with the runtime-mutable lr."""
    import jax.numpy as jnp
    import optax

    from mcgm_tpu.train.optim import make_optimizer, set_learning_rate

    params = {"w": jnp.zeros(3)}
    grads = {"w": jnp.ones(3)}
    opt = make_optimizer({"optimizer_name": "SGD", "lr": 1.0,
                          "weight_decay": 0, "lr_warmup_steps": 4})
    st = opt.init(params)
    mags = []
    for _ in range(6):
        upd, st = opt.update(grads, st, params)
        mags.append(float(-upd["w"][0]))
    assert np.allclose(mags, [0.25, 0.5, 0.75, 1.0, 1.0, 1.0])
    # composes with a mutated lr
    st = set_learning_rate(st, 0.1)
    upd, st = opt.update(grads, st, params)
    assert np.isclose(float(-upd["w"][0]), 0.1)


def test_glow_family_gets_warmup_default():
    from mcgm_tpu.train.loop import apply_family_overrides

    cfg = apply_family_overrides({"model_name": "cglow"})
    assert cfg["lr_warmup_steps"] == 16
    cfg2 = apply_family_overrides({"model_name": "mcvae"})
    assert not cfg2.get("lr_warmup_steps")
