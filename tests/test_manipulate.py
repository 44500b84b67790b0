"""create/transit pytree transforms (reference src/models/utils.py:24-152)."""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import make_tiny_cfg
from mcgm_tpu.models import build_model
from mcgm_tpu.models.manipulate import (create, transit, transit_codebook,
                                        transit_embedding)

K = jax.random.PRNGKey(0)


def _variables(name):
    cfg = make_tiny_cfg(name)
    cfg["classes_size"] = 10
    m = build_model(cfg)
    if name in ("mcpixelcnn", "cpixelcnn"):
        batch = {"img": jnp.zeros((2, 8, 8), jnp.int32), "label": jnp.array([0, 1])}
    else:
        batch = {"img": jnp.zeros((2, *cfg["data_shape"])), "label": jnp.array([0, 1])}
    rngs = {"params": K, "reparam": K, "noise": K, "z": K}
    return cfg, m, m.init(rngs, batch, train=True)


def _codebooks(variables):
    leaves = []
    def walk(path, leaf):
        if getattr(path[-1], "key", None) == "codebook":
            leaves.append(np.asarray(leaf))
        return leaf
    jax.tree_util.tree_map_with_path(walk, variables)
    return leaves


def test_create_rewrites_codebooks_to_new_mode_count():
    _, _, v = _variables("mcvae")
    v2 = create(v, classes_size=17)
    for cb in _codebooks(v2):
        assert cb.shape[0] == 17
        assert len({r.tobytes() for r in cb.astype(np.uint8)}) == 17


def test_create_mixes_cvae_embeddings():
    _, _, v = _variables("cvae")
    old = np.asarray(v["params"]["encoder"]["embedding"]["kernel"])
    v2 = create(v, classes_size=7)
    new = np.asarray(v2["params"]["encoder"]["embedding"]["kernel"])
    assert new.shape == (7, old.shape[1])
    # convex combinations stay inside the per-dimension bounding box of the
    # old rows (and differ from any single old row)
    assert (new >= old.min(axis=0) - 1e-5).all()
    assert (new <= old.max(axis=0) + 1e-5).all()
    assert not any(np.allclose(new[0], old[i]) for i in range(old.shape[0]))


def test_create_mixes_pixelcnn_class_embeddings():
    _, _, v = _variables("cpixelcnn")
    p = v["params"]["layer_0"]["class_cond_embedding"]["embedding"]
    v2 = create(v, classes_size=5)
    p2 = v2["params"]["layer_0"]["class_cond_embedding"]["embedding"]
    assert np.asarray(p2).shape == (5, np.asarray(p).shape[1])


def test_create_does_not_touch_input_code_embedding():
    _, _, v = _variables("mcpixelcnn")
    before = np.asarray(v["params"]["embedding"]["embedding"])
    v2 = create(v, classes_size=5)
    after = np.asarray(v2["params"]["embedding"]["embedding"])
    assert np.array_equal(before, after)


def test_transit_alpha_one_is_identity():
    _, _, v = _variables("mcvae")
    v2 = transit(v, root=0, alpha=1.0)
    for a, b in zip(_codebooks(v), _codebooks(v2)):
        assert np.array_equal(a, b)


def test_transit_alpha_zero_clones_root():
    _, _, v = _variables("mcvae")
    v2 = transit(v, root=0, alpha=0.0)
    for cb in _codebooks(v2):
        assert np.allclose(cb, cb[0:1])  # every row equals the root row


def test_transit_codebook_crossover_math():
    cb = np.asarray(jnp.asarray(np.arange(20, dtype=np.float32).reshape(4, 5)))
    out = np.asarray(transit_codebook(cb, root=1, alpha=0.4))
    cross = int(round(0.6 * 5))  # = 3
    assert np.array_equal(out[1], cb[1])  # root unchanged
    assert np.array_equal(out[0, :cross], cb[1, :cross])
    assert np.array_equal(out[0, cross:], cb[0, cross:])


def test_transit_embedding_lerp_math():
    w = np.asarray(jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3)))
    out = np.asarray(transit_embedding(w, root=0, alpha=0.25, axis=0))
    assert np.array_equal(out[0], w[0])
    assert np.allclose(out[2], 0.25 * w[2] + 0.75 * w[0])


def test_transit_cglow_prior_embedding():
    _, _, v = _variables("cglow")
    blk = [k for k in v["params"] if k.startswith("block_")][-1]
    kern = np.asarray(v["params"][blk]["embedding"]["conv"]["kernel"])
    assert kern.shape[2] == 10  # mode axis
    v2 = transit(v, root=0, alpha=0.0)
    kern2 = np.asarray(v2["params"][blk]["embedding"]["conv"]["kernel"])
    # all mode rows collapse onto root
    assert np.allclose(kern2[0, 0], kern2[0, 0, 0:1])
