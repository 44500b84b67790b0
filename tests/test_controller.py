"""MultimodalController unit tests (reference behavior:
src/modules/modules.py:49-76)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.ops.controller import MultimodalController, make_codebook, mc_gate, one_hot


def test_codebook_unique_rows():
    cb = np.asarray(make_codebook(0, 100, 32, 0.5))
    assert cb.shape == (100, 32)
    assert set(np.unique(cb)) <= {0.0, 1.0}
    rows = {r.tobytes() for r in cb.astype(np.uint8)}
    assert len(rows) == 100


def test_codebook_deterministic_per_seed():
    a = np.asarray(make_codebook(7, 50, 16, 0.5))
    b = np.asarray(make_codebook(7, 50, 16, 0.5))
    c = np.asarray(make_codebook(8, 50, 16, 0.5))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_codebook_rate_one_is_all_ones():
    cb = np.asarray(make_codebook(0, 10, 16, 1))
    assert np.all(cb == 1.0)


def test_codebook_rate_statistics():
    cb = np.asarray(make_codebook(0, 1000, 64, 0.3))
    assert abs(cb.mean() - 0.3) < 0.02


def test_codebook_impossible_raises():
    with pytest.raises(ValueError):
        make_codebook(0, 100, 2, 0.5)  # only 4 unique masks exist


def test_gate_selects_mask_row():
    cb = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    x = jnp.ones((2, 3, 3, 8))
    ind = one_hot(jnp.array([1, 3]), 4)
    y = mc_gate(x, ind, cb)
    expected0 = np.zeros(8); expected0[1] = 1
    expected1 = np.zeros(8); expected1[3] = 1
    assert np.allclose(y[0, 0, 0], expected0)
    assert np.allclose(y[1, 2, 2], expected1)


def test_gate_mask_is_non_differentiable():
    """reference modules.py:75: mask detached — grads flow to x only."""
    cb = jnp.ones((4, 8)) * 0.5
    ind = one_hot(jnp.array([0]), 4)

    def f(x):
        return jnp.sum(mc_gate(x, ind, cb))

    g = jax.grad(f)(jnp.ones((1, 8)))
    assert np.allclose(g, 0.5)


def test_gate_2d_and_4d_broadcast():
    cb = make_codebook(0, 4, 8, 0.5)
    ind = one_hot(jnp.array([2]), 4)
    y2 = mc_gate(jnp.ones((1, 8)), ind, cb)
    y4 = mc_gate(jnp.ones((1, 5, 5, 8)), ind, cb)
    assert y2.shape == (1, 8)
    assert y4.shape == (1, 5, 5, 8)
    assert np.allclose(y4[0, 0, 0], y2[0])


def test_module_persists_codebook_variable():
    mc = MultimodalController(8, 4, 0.5)
    x = jnp.ones((2, 8))
    ind = one_hot(jnp.array([0, 1]), 4)
    v = mc.init(jax.random.PRNGKey(0), x, ind)
    assert "codebook" in v
    cb = v["codebook"]["codebook"]
    assert cb.shape == (4, 8)
    y = mc.apply(v, x, ind)
    assert np.allclose(np.asarray(y), np.asarray(cb)[:2])


def test_soft_indicator_mixes_rows():
    """transit/create rely on indicator @ codebook supporting soft rows."""
    cb = jnp.asarray(np.array([[1, 0], [0, 1]], np.float32))
    ind = jnp.asarray(np.array([[0.5, 0.5]], np.float32))
    y = mc_gate(jnp.ones((1, 2)), ind, cb)
    assert np.allclose(y, 0.5)
