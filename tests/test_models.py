"""Cross-family model contract tests: build from cfg, forward returns a
finite loss, generate returns [-1,1] images of data shape."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.models import build_model
from mcgm_tpu.train.loop import FAMILY, RNG_STREAMS

K = jax.random.PRNGKey(0)
ALL = ["mcvae", "cvae", "vqvae", "classifier", "mcgan", "cgan",
       "mcglow", "cglow", "mcpixelcnn", "cpixelcnn"]


def _batch(cfg, model_name, bs=4):
    if FAMILY[model_name] == "pixelcnn":
        img = jnp.zeros((bs, 8, 8), jnp.int32)
    else:
        img = jax.random.uniform(K, (bs, *cfg["data_shape"]), minval=-1, maxval=1)
    return {"img": img, "label": jnp.arange(bs) % cfg["classes_size"]}


@pytest.mark.parametrize("name", ALL)
def test_forward_loss_finite(name):
    cfg = make_tiny_cfg(name)
    cfg["classes_size"] = 10
    m = build_model(cfg)
    batch = _batch(cfg, name)
    rngs = {"params": K, "reparam": K, "noise": K, "z": K}
    v = m.init(rngs, batch, train=True)
    mutable = [k for k in v if k != "params"]
    if name in ("mcgan", "cgan"):
        out, _ = m.apply(v, batch, train=True, rngs={"z": K}, mutable=mutable)
        assert out.shape == (4, 1)  # G→D chain logit
        return
    out, _ = m.apply(v, batch, train=True, rngs=rngs, mutable=mutable)
    assert np.isfinite(float(out["loss"]))


@pytest.mark.parametrize("name", ["mcvae", "cvae", "mcgan", "cgan", "mcglow", "cglow"])
def test_generate_range_and_shape(name):
    cfg = make_tiny_cfg(name)
    cfg["classes_size"] = 10
    m = build_model(cfg)
    batch = _batch(cfg, name)
    rngs = {"params": K, "reparam": K, "noise": K, "z": K}
    v = m.init(rngs, batch, train=True)
    C = jnp.array([0, 5, 9])
    gen = m.apply(v, C, method="generate", rngs={"z": K})
    assert gen.shape == (3, *cfg["data_shape"])
    g = np.asarray(gen)
    assert np.isfinite(g).all()
    assert g.min() >= -1.001 and g.max() <= 1.001


def test_vqvae_code_grid_and_decode_code():
    cfg = make_tiny_cfg("vqvae")
    cfg["classes_size"] = 10
    m = build_model(cfg)
    batch = _batch(cfg, "vqvae")
    v = m.init({"params": K}, batch, train=True)
    out, _ = m.apply(v, batch, train=True, mutable=["batch_stats", "vq_stats"])
    assert out["code"].shape == (4, 8, 8)  # 32px → 8x8 grid (reference vqvae)
    dec = m.apply(v, out["code"], method="decode_code")
    assert dec.shape == (4, 32, 32, 3)


def test_classifier_feature_dim():
    cfg = make_tiny_cfg("classifier")
    cfg["classes_size"] = 10
    m = build_model(cfg)
    batch = _batch(cfg, "classifier")
    v = m.init({"params": K}, batch, train=True)
    f = m.apply(v, batch, method="feature")
    assert f.shape == (4, cfg["classifier"]["hidden_size"][-1] * 4 * 4)


def test_128px_vae_and_glow_build():
    """High-res config path (reference utils.py:118-120: CelebA-HQ/ImageNet
    shapes) — encoder depth 5 lands on a 4x4 grid; glow L=5."""
    from mcgm_tpu.models.vae import MCVAE
    from mcgm_tpu.models.glow import MCGlow

    img = jnp.zeros((1, 128, 128, 3))
    lbl = jnp.zeros((1,), jnp.int32)
    m = MCVAE((128, 128, 3), (4, 4, 4, 4, 4), 8, 1, 4, 0.5)
    v = m.init({"params": K, "reparam": K}, {"img": img, "label": lbl}, train=True)
    out, _ = m.apply(v, {"img": img, "label": lbl}, train=True,
                     rngs={"reparam": K}, mutable=["batch_stats"])
    assert out["img"].shape == (1, 128, 128, 3)
    g = MCGlow((128, 128, 3), hidden_size=8, K=1, L=5, num_mode=4,
               controller_rate=0.5, scan_flows=False)
    vg = g.init({"params": K, "noise": K}, {"img": img, "label": lbl}, train=True)
    assert g.make_z_shapes()[-1] == (4, 4, 192)


def test_128px_gan_generator_matches_data_shape():
    """The 5-entry 128px hidden list (reference utils.py:167-168) must
    produce 128x128 samples. The reference generator's own 128px config
    emits 64x64 (mcgan.py:51-67 does len(hidden)-1 stride-2 blocks from a
    hardcoded 4x4 start) — we derive the start resolution instead, so G(z)
    always matches data_shape; at 32px the derived start is the same 4x4."""
    from mcgm_tpu.models.gan import MCGenerator, CGenerator

    z = jnp.zeros((2, 8))
    ind = jnp.eye(4)[jnp.zeros((2,), jnp.int32)]
    for cls, kw in ((MCGenerator, dict(num_mode=4, controller_rate=0.5)),
                    (CGenerator, dict(num_mode=4, embedding_size=8))):
        g = cls((128, 128, 3), 8, (8, 8, 8, 8, 8), **kw)
        v = g.init({"params": K}, z, ind, train=True)
        out, _ = g.apply(v, z, ind, train=True, mutable=["batch_stats"])
        assert out.shape == (2, 128, 128, 3)
        # 32px path unchanged: 4-entry list -> 4x4 start, 3 upsamples
        g32 = cls((32, 32, 3), 8, (8, 8, 8, 8), **kw)
        v32 = g32.init({"params": K}, z, ind, train=True)
        out32, _ = g32.apply(v32, z, ind, train=True, mutable=["batch_stats"])
        assert out32.shape == (2, 32, 32, 3)


def test_mc_vs_c_param_structure():
    """mc models carry codebooks; c models carry class embeddings."""
    cfg = make_tiny_cfg("mcvae"); cfg["classes_size"] = 10
    v_mc = build_model(cfg).init({"params": K, "reparam": K},
                                 _batch(cfg, "mcvae"), train=True)
    assert "codebook" in v_mc
    cfg = make_tiny_cfg("cvae"); cfg["classes_size"] = 10
    v_c = build_model(cfg).init({"params": K, "reparam": K},
                                _batch(cfg, "cvae"), train=True)
    assert "codebook" not in v_c
    assert "embedding" in v_c["params"]["encoder"]


def test_128px_vqvae_code_grid_and_pixelcnn_chain():
    """The 128px vqvae config (reference utils.py:130-133: 4-entry
    hidden list -> 4 stride-2 stages) must land on the 8x8 code grid the
    reference's high-res protocol implies, decode back to 128px, and feed
    a PixelCNN over the 32x32 grid (data_shape//4) — completing the
    128px-protocol coverage matrix (vae/glow/gan are pinned above)."""
    from mcgm_tpu.models.pixelcnn import MCPixelCNN
    from mcgm_tpu.models.vqvae import VQVAE

    img = jnp.zeros((1, 128, 128, 3))
    m = VQVAE((128, 128, 3), (4, 4, 4, 4), 1, 8, 32)
    v = m.init({"params": K}, {"img": img}, train=True)
    (_, _, code), _ = m.apply(v, img, train=True, method="encode",
                              mutable=["batch_stats", "vq_stats"])
    assert code.shape == (1, 8, 8)
    dec, _ = m.apply(v, code, train=True, method="decode_code",
                     mutable=["batch_stats"])
    assert dec.shape == (1, 128, 128, 3)

    # pixelcnn over the 128px protocol's 32x32 grid (data_shape[0] // 4)
    grid = jnp.zeros((1, 32, 32), jnp.int32)
    p = MCPixelCNN(input_size=32, hidden_size=8, num_layer=2, num_mode=4,
                   controller_rate=0.5)
    vp = p.init({"params": K}, {"img": grid, "label": jnp.zeros((1,), jnp.int32)},
                train=True)
    out, _ = p.apply(vp, {"img": grid, "label": jnp.zeros((1,), jnp.int32)},
                     train=True, mutable=["batch_stats"])
    assert out["logits"].shape == (1, 32, 32, 32)
