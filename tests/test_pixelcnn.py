"""PixelCNN causality and sampling tests.

Causality invariant (reference masks at mcpixelcnn.py:43-49 with a mask-A
first layer): logits at raster position (i, j) are independent of the input
at (i, j) and at every raster-later position.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mcgm_tpu.models.pixelcnn import CPixelCNN, MCPixelCNN, sample_codes

K = jax.random.PRNGKey(0)


def _build(cls):
    m = cls(input_size=16, hidden_size=8, num_layer=3, num_mode=4)
    img = jnp.zeros((1, 6, 6), jnp.int32)
    lbl = jnp.array([1])
    v = m.init(K, {"img": img, "label": lbl}, train=True)
    return m, v


def _logits(m, v, img, lbl=jnp.array([1])):
    return np.asarray(m.apply(v, {"img": img, "label": lbl}, False)["logits"])


def test_causality_mc():
    m, v = _build(MCPixelCNN)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.integers(0, 16, (1, 6, 6)), jnp.int32)
    ref = _logits(m, v, base)
    # flip a raster-later position; logits at (i,j) and earlier must not move
    for (i, j) in [(2, 3), (4, 0)]:
        mod = np.asarray(base).copy()
        mod[0, i, j] = (mod[0, i, j] + 7) % 16
        out = _logits(m, v, jnp.asarray(mod))
        # all strictly-earlier positions unaffected
        for (a, b) in [(i, j), (i, j - 1), (i - 1, 5), (0, 0)]:
            if (a, b) == (i, j) or a < i or (a == i and b <= j):
                assert np.allclose(out[0, a, b], ref[0, a, b], atol=1e-5), (a, b)
        # some later position should differ (signal flows forward)
    mod = np.asarray(base).copy()
    mod[0, 0, 0] = (mod[0, 0, 0] + 7) % 16
    out = _logits(m, v, jnp.asarray(mod))
    assert np.abs(out[0, 1, 1] - ref[0, 1, 1]).max() > 1e-9
    # and the far corner still receives (attenuated) influence
    assert np.abs(out[0, 5, 5] - ref[0, 5, 5]).max() > 0


def test_causality_conditional():
    m, v = _build(CPixelCNN)
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.integers(0, 16, (1, 6, 6)), jnp.int32)
    ref = _logits(m, v, base)
    mod = np.asarray(base).copy()
    mod[0, 3, 3] = (mod[0, 3, 3] + 5) % 16
    out = _logits(m, v, jnp.asarray(mod))
    assert np.allclose(out[0, 3, 3], ref[0, 3, 3], atol=1e-5)
    assert np.allclose(out[0, 2, 5], ref[0, 2, 5], atol=1e-5)


def test_class_conditioning_changes_logits():
    m, v = _build(MCPixelCNN)
    img = jnp.zeros((1, 6, 6), jnp.int32)
    a = _logits(m, v, img, jnp.array([0]))
    b = _logits(m, v, img, jnp.array([2]))
    assert not np.allclose(a, b)


def test_sample_codes_shape_and_range():
    m, v = _build(MCPixelCNN)
    C = jnp.array([0, 1, 2])
    codes = sample_codes(m.apply, v, C, jax.random.PRNGKey(3), grid_hw=(6, 6))
    codes = np.asarray(codes)
    assert codes.shape == (3, 6, 6)
    assert codes.min() >= 0 and codes.max() < 16


def test_loss_is_ce_over_codes():
    m, v = _build(MCPixelCNN)
    img = jnp.zeros((2, 6, 6), jnp.int32)
    out = m.apply(v, {"img": img, "label": jnp.array([0, 1])}, False)
    logits = np.asarray(out["logits"], np.float64)
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    ref = -logp[..., 0].mean()
    assert abs(float(out["loss"]) - ref) < 1e-4


def test_incremental_sampler_matches_full():
    """sample_codes_incremental reproduces sample_codes exactly: same rng →
    identical codes, and its per-position logits equal a full forward on the
    final image (causality: logits at (i,j) only see positions < (i,j))."""
    from mcgm_tpu.models.pixelcnn import sample_codes_incremental

    for cls in (MCPixelCNN, CPixelCNN):
        m, v = _build(cls)
        C = jnp.array([0, 1, 2, 3])
        rng = jax.random.PRNGKey(5)
        full = np.asarray(sample_codes(m.apply, v, C, rng, grid_hw=(6, 6)))
        inc, logits = sample_codes_incremental(m, v, C, rng, grid_hw=(6, 6),
                                               return_logits=True)
        inc, logits = np.asarray(inc), np.asarray(logits)
        assert np.array_equal(full, inc), cls.__name__
        ref_logits = np.asarray(
            m.apply(v, {"img": jnp.asarray(inc), "label": C}, False)["logits"]
        )
        assert np.allclose(logits, ref_logits, atol=1e-4), cls.__name__
