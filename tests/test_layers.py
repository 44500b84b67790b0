"""Layer-level tests: torch-shape conventions, spectral norm convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.ops.layers import (Conv, ConvTranspose, Dense, SNConv, SNDense,
                                 avg_pool, global_sum_pool, max_pool,
                                 upsample_nearest)

K = jax.random.PRNGKey(0)


def test_conv_shapes_match_torch():
    x = jnp.zeros((2, 32, 32, 3))
    assert Conv(8, 4, 2, 1).init_with_output(K, x)[0].shape == (2, 16, 16, 8)
    assert Conv(8, 3, 1, 1).init_with_output(K, x)[0].shape == (2, 32, 32, 8)
    assert Conv(8, 1, 1, 0).init_with_output(K, x)[0].shape == (2, 32, 32, 8)
    assert Conv(8, 7, 1, 3).init_with_output(K, x)[0].shape == (2, 32, 32, 8)


def test_conv_transpose_doubles():
    x = jnp.zeros((2, 8, 8, 4))
    y, _ = ConvTranspose(8, 4, 2, 1).init_with_output(K, x)
    assert y.shape == (2, 16, 16, 8)


def test_conv_transpose_matches_torch_math():
    """ConvT(k=4,s=2,p=1) on a delta == kernel values scattered correctly."""
    x = np.zeros((1, 2, 2, 1), np.float32)
    x[0, 0, 0, 0] = 1.0
    m = ConvTranspose(1, 4, 2, 1, use_bias=False)
    v = m.init(K, jnp.asarray(x))
    kern = np.asarray(v["params"]["kernel"])[..., 0, 0]  # [4,4]
    y = np.asarray(m.apply(v, jnp.asarray(x)))[0, ..., 0]
    # torch: output[i,j] = sum_k x[k] * w[i - 2k + 1] over valid; the delta at
    # (0,0) writes kernel[1:4, 1:4] (after pad crop) into y[0:3, 0:3]
    assert y.shape == (4, 4)
    assert np.allclose(y[0:3, 0:3], kern[1:4, 1:4], atol=1e-6)


def test_upsample_nearest():
    x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
    y = np.asarray(upsample_nearest(x, 2))[0, ..., 0]
    assert np.array_equal(y[:2, :2], np.zeros((2, 2)))
    assert np.array_equal(y[2:, 2:], np.full((2, 2), 3.0))


def test_pools():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    assert np.asarray(max_pool(x))[0, 0, 0, 0] == 5.0
    assert np.asarray(avg_pool(x))[0, 0, 0, 0] == 2.5
    assert global_sum_pool(x).shape == (1, 1)
    assert float(global_sum_pool(x)[0, 0]) == x.sum()


def test_spectral_norm_converges_to_unit_sigma():
    """After many power iterations, the top singular value of W/sigma ≈ 1."""
    m = SNDense(16)
    x = jnp.ones((4, 32))
    v = m.init(K, x)
    spectral = v["spectral"]
    for _ in range(50):
        _, mut = m.apply({**v, "spectral": spectral}, x, update_stats=True,
                         mutable=["spectral"])
        spectral = mut["spectral"]
    kernel = np.asarray(v["params"]["kernel"])
    u = np.asarray(spectral["u"])
    mat = kernel.reshape(-1, kernel.shape[-1]).T
    v_vec = mat.T @ u
    v_vec /= np.linalg.norm(v_vec)
    u2 = mat @ v_vec
    sigma = np.linalg.norm(u2)
    top_sv = np.linalg.svd(mat, compute_uv=False)[0]
    assert abs(sigma - top_sv) / top_sv < 1e-3


def test_spectral_norm_no_update_in_eval():
    m = SNConv(8, 3, 1, 1)
    x = jnp.ones((2, 8, 8, 4))
    v = m.init(K, x)
    _, mut = m.apply(v, x, update_stats=False, mutable=["spectral"])
    assert np.array_equal(np.asarray(mut["spectral"]["u"]),
                          np.asarray(v["spectral"]["u"]))


@pytest.mark.parametrize("impl", ["dilated", "phase4"])
def test_upsampled_conv_matches_naive_composition(impl):
    """UpsampledConv == Conv(3x3,pad1) on nearest-up(2) input, same params,
    for BOTH implementations: the lhs-dilated single conv (production
    default — writes the interleaved output directly) and the 4-phase
    decomposition (kept as the measured alternative)."""
    from mcgm_tpu.ops.layers import UPCONV_IMPL, UpsampledConv

    x = jax.random.normal(K, (2, 5, 7, 6))
    fused = UpsampledConv(4)
    v = fused.init(K, x)
    old = UPCONV_IMPL[0]
    try:
        UPCONV_IMPL[0] = impl
        got = fused.apply(v, x)
    finally:
        UPCONV_IMPL[0] = old
    naive = Conv(4, 3, 1, 1).apply(v, upsample_nearest(x, 2))
    assert got.shape == (2, 10, 14, 4)
    assert np.allclose(np.asarray(got), np.asarray(naive), atol=1e-5)


def test_snconvpool_matches_naive_composition():
    """SNConvPool == avg_pool(SNConv(3x3,pad1)(x)), same params/spectral u."""
    from mcgm_tpu.ops.layers import SNConvPool

    x = jax.random.normal(K, (2, 8, 8, 6))
    fused = SNConvPool(4)
    v = fused.init(K, x)
    got, mut = fused.apply(v, x, update_stats=True, mutable=["spectral"])
    naive, mut_naive = SNConv(4, 3, 1, 1).apply(v, x, update_stats=True,
                                                mutable=["spectral"])
    naive = avg_pool(naive, 2)
    assert got.shape == (2, 4, 4, 4)
    assert np.allclose(np.asarray(got), np.asarray(naive), atol=1e-5)
    # spectral-norm power iteration runs on the ORIGINAL 3x3 kernel -> the
    # updated u vectors must agree between fused and naive paths
    assert np.allclose(np.asarray(mut["spectral"]["u"]),
                       np.asarray(mut_naive["spectral"]["u"]), atol=1e-6)


@pytest.mark.parametrize("impl", ["dilated", "phase4"])
def test_upsampled_conv_gradients_match_naive(impl):
    """Autodiff through the fold equals autodiff through the composition."""
    from mcgm_tpu.ops.layers import UPCONV_IMPL, UpsampledConv

    x = jax.random.normal(K, (2, 4, 4, 3))
    fused = UpsampledConv(4)
    v = fused.init(K, x)

    def loss_fused(p):
        return jnp.sum(fused.apply(p, x) ** 2)

    def loss_naive(p):
        return jnp.sum(Conv(4, 3, 1, 1).apply(p, upsample_nearest(x, 2)) ** 2)

    old = UPCONV_IMPL[0]
    try:
        UPCONV_IMPL[0] = impl
        g1 = jax.grad(loss_fused)(v)
    finally:
        UPCONV_IMPL[0] = old
    g2 = jax.grad(loss_naive)(v)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_resolve_compute_dtype():
    from mcgm_tpu.ops.layers import resolve_compute_dtype

    # tests run on CPU: 'auto' must resolve to full f32 there
    assert resolve_compute_dtype("auto") is None
    assert resolve_compute_dtype(None) is None
    assert resolve_compute_dtype("float32") is None
    assert resolve_compute_dtype("bfloat16") == jnp.bfloat16
    import pytest

    with pytest.raises(ValueError):
        resolve_compute_dtype("fp8")


def test_add_upsampled_nearest_matches_naive():
    from mcgm_tpu.ops.layers import add_upsampled_nearest

    k1, k2 = jax.random.split(K)
    h = jax.random.normal(k1, (2, 8, 8, 5))
    sc = jax.random.normal(k2, (2, 4, 4, 5))
    fused = add_upsampled_nearest(h, sc, 2)
    naive = h + upsample_nearest(sc, 2)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive), atol=1e-6)
    # gradients through both operands match the naive composition
    g1 = jax.grad(lambda a, b: jnp.sum(add_upsampled_nearest(a, b) ** 2),
                  argnums=(0, 1))(h, sc)
    g2 = jax.grad(lambda a, b: jnp.sum((a + upsample_nearest(b, 2)) ** 2),
                  argnums=(0, 1))(h, sc)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_conv_s2d_matches_naive():
    from mcgm_tpu.ops.layers import conv3x3_s2d

    k1, k2 = jax.random.split(K)
    x = jax.random.normal(k1, (2, 8, 8, 7))
    kern = jax.random.normal(k2, (3, 3, 7, 3)) * 0.3

    def naive(x, kern):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for f in (2, 4):
        np.testing.assert_allclose(np.asarray(conv3x3_s2d(x, kern, f)),
                                   np.asarray(naive(x, kern)),
                                   atol=1e-5)
    # gradients re-index exactly too
    g1 = jax.grad(lambda a, b: jnp.sum(conv3x3_s2d(a, b, 4) ** 2),
                  argnums=(0, 1))(x, kern)
    g2 = jax.grad(lambda a, b: jnp.sum(naive(a, b) ** 2),
                  argnums=(0, 1))(x, kern)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_conv_s2d_module_param_compatible():
    from mcgm_tpu.ops.layers import Conv, ConvS2D

    x = jnp.zeros((2, 8, 8, 7))
    v1 = Conv(3, 3, 1, 1).init(K, x)
    v2 = ConvS2D(3, factor=2).init(K, x)
    s1 = jax.tree_util.tree_map(lambda a: a.shape, v1)
    s2 = jax.tree_util.tree_map(lambda a: a.shape, v2)
    assert s1 == s2
