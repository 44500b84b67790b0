"""Pallas kernels vs plain-XLA reference semantics (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from mcgm_tpu.ops.controller import make_codebook, mc_gate, one_hot
from mcgm_tpu.ops.pallas_kernels import mc_gated_matmul, vq_assign

K = jax.random.PRNGKey(0)


def test_mc_gated_matmul_matches_reference():
    M, Kd, N, modes = 48, 64, 200, 10
    x = jax.random.normal(K, (M, Kd))
    w = jax.random.normal(jax.random.PRNGKey(1), (Kd, N))
    cb = make_codebook(0, modes, N, 0.5)
    ind = one_hot(jnp.arange(M) % modes, modes)
    ref = mc_gate(x @ w, ind, cb)
    out = mc_gated_matmul(x, w, ind, cb)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_mc_gated_matmul_gradients_skip_mask():
    M, Kd, N, modes = 16, 32, 64, 4
    x = jax.random.normal(K, (M, Kd))
    w = jax.random.normal(jax.random.PRNGKey(1), (Kd, N))
    cb = make_codebook(0, modes, N, 0.5)
    ind = one_hot(jnp.arange(M) % modes, modes)

    def f_pallas(x, w):
        return jnp.sum(mc_gated_matmul(x, w, ind, cb) ** 2)

    def f_ref(x, w):
        return jnp.sum(mc_gate(x @ w, ind, cb) ** 2)

    gx_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    assert np.allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    assert np.allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)


def test_vq_assign_matches_argmin():
    N, D, Kc = 77, 16, 128
    flat = jax.random.normal(K, (N, D))
    emb = jax.random.normal(jax.random.PRNGKey(2), (D, Kc))
    dist = (jnp.sum(flat**2, 1, keepdims=True) - 2 * flat @ emb
            + jnp.sum(emb**2, 0, keepdims=True))
    ref = jnp.argmin(dist, axis=1)
    out = vq_assign(flat, emb)
    assert np.array_equal(np.asarray(out), np.asarray(ref))


def test_vq_assign_unaligned_sizes():
    flat = jax.random.normal(K, (13, 8))
    emb = jax.random.normal(jax.random.PRNGKey(2), (8, 32))
    dist = (jnp.sum(flat**2, 1, keepdims=True) - 2 * flat @ emb
            + jnp.sum(emb**2, 0, keepdims=True))
    assert np.array_equal(np.asarray(vq_assign(flat, emb)),
                          np.asarray(jnp.argmin(dist, axis=1)))
