"""VectorQuantizerEMA tests against a numpy reimplementation of the reference
math (src/modules/modules.py:18-43)."""

import numpy as np
import jax
import jax.numpy as jnp

from mcgm_tpu.ops.vq import VectorQuantizerEMA

D, K = 4, 8


def _ref_update(flat, emb, cluster, emb_mean, decay=0.99, eps=1e-5):
    dist = (flat**2).sum(1, keepdims=True) - 2 * flat @ emb + (emb**2).sum(0, keepdims=True)
    ind = dist.argmin(1)
    onehot = np.eye(K)[ind]
    cluster = cluster * decay + onehot.sum(0) * (1 - decay)
    emb_mean = emb_mean * decay + (flat.T @ onehot) * (1 - decay)
    n = cluster.sum()
    smoothed = (cluster + eps) / (n + K * eps) * n
    new_emb = emb_mean / smoothed[None, :]
    return ind, cluster, emb_mean, new_emb


def _setup():
    vq = VectorQuantizerEMA(D, K)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, D))
    v = vq.init(jax.random.PRNGKey(0), x, train=False)
    return vq, x, v


def test_nearest_code_and_shapes():
    vq, x, v = _setup()
    (q, diff, code), _ = vq.apply(v, x, train=False, mutable=[])
    assert q.shape == x.shape
    assert code.shape == x.shape[:-1]
    emb = np.asarray(v["vq_stats"]["embedding"])
    flat = np.asarray(x).reshape(-1, D)
    dist = (flat**2).sum(1, keepdims=True) - 2 * flat @ emb + (emb**2).sum(0, keepdims=True)
    assert np.array_equal(np.asarray(code).ravel(), dist.argmin(1))


def test_ema_update_matches_reference_math():
    vq, x, v = _setup()
    emb0 = np.asarray(v["vq_stats"]["embedding"])
    cl0 = np.asarray(v["vq_stats"]["cluster_size"])
    em0 = np.asarray(v["vq_stats"]["embedding_mean"])
    (_, _, _), mut = vq.apply(v, x, train=True, mutable=["vq_stats"])
    flat = np.asarray(x).reshape(-1, D)
    _, cl_ref, em_ref, emb_ref = _ref_update(flat, emb0, cl0, em0)
    assert np.allclose(np.asarray(mut["vq_stats"]["cluster_size"]), cl_ref, atol=1e-5)
    assert np.allclose(np.asarray(mut["vq_stats"]["embedding_mean"]), em_ref, atol=1e-5)
    assert np.allclose(np.asarray(mut["vq_stats"]["embedding"]), emb_ref, atol=1e-4)


def test_straight_through_gradient():
    vq, x, v = _setup()

    def f(x):
        (q, diff, _), _ = vq.apply(v, x, train=False, mutable=[])
        return jnp.sum(q * 2.0)

    g = jax.grad(f)(x)
    # straight-through: dq/dx = identity
    assert np.allclose(np.asarray(g), 2.0)


def test_eval_does_not_mutate():
    vq, x, v = _setup()
    (_, _, _), mut = vq.apply(v, x, train=False, mutable=["vq_stats"])
    for k in ("embedding", "cluster_size", "embedding_mean"):
        assert np.array_equal(np.asarray(mut["vq_stats"][k]),
                              np.asarray(v["vq_stats"][k]))


def test_embedding_code_roundtrip():
    vq, x, v = _setup()
    (q, _, code), _ = vq.apply(v, x, train=False, mutable=[])
    q2 = vq.apply(v, code, method="embedding_code")
    assert np.allclose(np.asarray(q), np.asarray(q2), atol=1e-6)
