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
