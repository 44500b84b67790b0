"""Numerical parity against torch semantics (SURVEY.md §7.3: seed-matched
sample fidelity needs op-level parity first). torch (CPU) is used as the
oracle for layer math — weights are copied across, outputs compared."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from mcgm_tpu.ops.layers import BatchNorm, Conv, ConvTranspose, Dense, SNDense

K = jax.random.PRNGKey(0)


def test_conv_matches_torch():
    x = np.random.default_rng(0).normal(size=(2, 9, 9, 5)).astype(np.float32)
    m = Conv(7, 3, 2, 1)
    v = m.init(K, jnp.asarray(x))
    kern = np.asarray(v["params"]["kernel"])  # HWIO
    bias = np.asarray(v["params"]["bias"])
    tm = torch.nn.Conv2d(5, 7, 3, 2, 1)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(kern.transpose(3, 2, 0, 1)))  # OIHW
        tm.bias.copy_(torch.tensor(bias))
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    assert np.allclose(out, ref, atol=1e-5)


def test_conv_transpose_matches_torch():
    x = np.random.default_rng(1).normal(size=(2, 6, 6, 4)).astype(np.float32)
    m = ConvTranspose(3, 4, 2, 1)
    v = m.init(K, jnp.asarray(x))
    kern = np.asarray(v["params"]["kernel"])  # HWIO
    bias = np.asarray(v["params"]["bias"])
    tm = torch.nn.ConvTranspose2d(4, 3, 4, 2, 1)
    with torch.no_grad():
        # torch ConvTranspose2d weight layout: (in, out, kh, kw)
        tm.weight.copy_(torch.tensor(kern.transpose(2, 3, 0, 1)))
        tm.bias.copy_(torch.tensor(bias))
        ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    out = np.asarray(m.apply(v, jnp.asarray(x)))
    assert out.shape == ref.shape
    assert np.allclose(out, ref, atol=1e-5)


def test_batchnorm_train_matches_torch():
    x = np.random.default_rng(2).normal(size=(8, 4, 4, 3)).astype(np.float32)
    m = BatchNorm()
    v = m.init(K, jnp.asarray(x), use_running_average=False)
    scale = np.asarray(v["params"]["bn"]["scale"])
    bias = np.asarray(v["params"]["bn"]["bias"])
    tm = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        tm.weight.copy_(torch.tensor(scale))
        tm.bias.copy_(torch.tensor(bias))
    tm.train()
    ref = tm(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    out, mut = m.apply(v, jnp.asarray(x), use_running_average=False,
                       mutable=["batch_stats"])
    assert np.allclose(np.asarray(out), ref, atol=1e-4)
    # running stats update: torch new = (1-momentum)*old + momentum*batch
    rm = tm.running_mean.numpy()
    ours = np.asarray(mut["batch_stats"]["bn"]["mean"])
    assert np.allclose(ours, rm, atol=1e-4)


def test_spectral_norm_sigma_matches_torch():
    x = np.random.default_rng(3).normal(size=(4, 6)).astype(np.float32)
    m = SNDense(5)
    v = m.init(K, jnp.asarray(x))
    kern = np.asarray(v["params"]["kernel"])  # (in, out)
    u0 = np.asarray(v["spectral"]["u"])  # (out,)
    tl = torch.nn.Linear(6, 5, bias=False)
    with torch.no_grad():
        tl.weight.copy_(torch.tensor(kern.T))
    tl = torch.nn.utils.spectral_norm(tl)
    with torch.no_grad():
        tl.weight_u.copy_(torch.tensor(u0))
        ref = tl(torch.tensor(x)).numpy()  # one power iteration in train mode
    out, _ = m.apply(v, jnp.asarray(x), update_stats=True, mutable=["spectral"])
    bias = np.asarray(v["params"]["bias"])
    assert np.allclose(np.asarray(out) - bias, ref, atol=1e-4)


def test_bce_matches_torch():
    from mcgm_tpu.models.vae import binary_cross_entropy

    p = np.clip(np.random.default_rng(4).uniform(0, 1, (32,)), 1e-6, 1 - 1e-6).astype(np.float32)
    t = np.random.default_rng(5).uniform(0, 1, (32,)).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy(
        torch.tensor(p), torch.tensor(t), reduction="none").numpy()
    ours = np.asarray(binary_cross_entropy(jnp.asarray(p), jnp.asarray(t)))
    assert np.allclose(ours, ref, atol=1e-5)


def test_gaussian_log_p_matches_torch_normal():
    from mcgm_tpu.models.glow import gaussian_log_p

    x = np.random.default_rng(6).normal(size=(16,)).astype(np.float32)
    mean = np.float32(0.3)
    log_sd = np.float32(-0.2)
    ref = torch.distributions.Normal(
        torch.tensor(mean), torch.tensor(np.exp(log_sd))
    ).log_prob(torch.tensor(x)).numpy()
    ours = np.asarray(gaussian_log_p(jnp.asarray(x), mean, log_sd))
    assert np.allclose(ours, ref, atol=1e-5)
