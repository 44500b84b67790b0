"""Metric correctness tests (reference src/metrics/metrics.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mcgm_tpu.evals.metrics import (accuracy, bce, dbi, fid_from_features,
                                    frechet_distance, inception_score, mse,
                                    nll, psnr, make_device_metrics)


def test_inception_score_uniform_is_one():
    probs = np.full((100, 10), 0.1)
    assert abs(inception_score(probs) - 1.0) < 1e-6


def test_inception_score_confident_distinct_classes():
    probs = np.eye(10)[np.arange(100) % 10] * 0.999 + 1e-4
    probs /= probs.sum(1, keepdims=True)
    s = inception_score(probs)
    assert s > 9.0  # near the class count for perfectly diverse confident preds


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 8))
    assert abs(fid_from_features(f, f.copy())) < 1e-4  # f32 eigh precision


def test_frechet_mean_shift():
    mu1, mu2 = np.zeros(4), np.ones(4) * 2
    sigma = np.eye(4)
    d = frechet_distance(mu1, sigma, mu2, sigma)
    assert abs(d - 16.0) < 1e-5  # ||mu1-mu2||^2


def test_frechet_eigh_matches_scipy_sqrtm():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(200, 16))
    b = rng.normal(size=(200, 16)) * 1.5 + 0.3
    mu1, s1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, s2 = b.mean(0), np.cov(b, rowvar=False)
    fast = frechet_distance(mu1, s1, mu2, s2, method="eigh")
    ref = frechet_distance(mu1, s1, mu2, s2, method="scipy")
    assert abs(fast - ref) / max(ref, 1e-9) < 1e-3


def test_dbi_matches_sklearn_if_available():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 1, (50, 2, 2, 1)),
                        rng.normal(5, 1, (50, 2, 2, 1))])
    y = np.repeat([0, 1], 50)
    ours = dbi(x, y)
    try:
        from sklearn.metrics import davies_bouldin_score
    except ImportError:
        assert 0 < ours < 1.0
        return
    ref = davies_bouldin_score(x.reshape(100, -1), y)
    assert abs(ours - ref) < 1e-9


def test_accuracy_topk():
    logits = jnp.asarray(np.array([[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]]))
    target = jnp.asarray(np.array([1, 0, 0]))
    assert abs(accuracy(logits, target) - 200.0 / 3) < 1e-4


def test_elementwise_metrics():
    a = jnp.zeros((4, 2, 2, 1))
    b = jnp.ones((4, 2, 2, 1)) * 0.5
    assert abs(mse(a, b) - 0.25) < 1e-6
    assert psnr(a, a + 0.1) > 19.0
    c = jnp.ones((4, 2, 2, 1)) * 0.6  # p=0.8 after [0,1] remap
    assert bce(c, c) < bce(c, -c)


def test_device_metrics_match_host():
    batch = {"img": jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4, 4, 4, 1)).astype(np.float32))}
    output = {"img": jnp.clip(batch["img"] + 0.1, -1, 1), "loss": jnp.asarray(1.5)}
    dm = make_device_metrics(["Loss", "MSE", "BCE"])(batch, output)
    assert abs(float(dm["Loss"]) - 1.5) < 1e-6
    assert abs(float(dm["MSE"]) - mse(output["img"], batch["img"])) < 1e-6
    assert abs(float(dm["BCE"]) - bce(output["img"], batch["img"])) < 1e-5
