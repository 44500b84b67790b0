"""InceptionV3 port: architecture shapes and torchvision-state-dict converter."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mcgm_tpu.evals.inception import (InceptionV3, bilinear_resize_299,
                                      convert_torch_state_dict)


@pytest.fixture(scope="module")
def init_vars():
    m = InceptionV3()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    return m, v


def test_output_shapes(init_vars):
    m, v = init_vars
    feats, logits = m.apply(v, jnp.zeros((2, 299, 299, 3)))
    assert feats.shape == (2, 2048)
    assert logits.shape == (2, 1000)


def test_param_count_matches_torchvision(init_vars):
    _, v = init_vars
    n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    # torchvision inception_v3 without aux classifier: 23,834,568 params
    assert n == 23_834_568


def test_converter_roundtrip_via_fake_state_dict(init_vars):
    """Build a torch-layout state dict from our init and convert it back —
    the tree must match exactly (so real torchvision weights load cleanly)."""
    m, v = init_vars
    sd = {}

    def walk(tree, prefix, coll):
        for k, val in tree.items():
            name = f"{prefix}.{k}" if prefix else k
            if isinstance(val, dict):
                walk(val, name, coll)
                continue
            arr = np.asarray(val)
            parts = name.split(".")
            if parts[-2] == "conv" and parts[-1] == "kernel":
                sd[".".join(parts[:-1]) + ".weight"] = arr.transpose(3, 2, 0, 1)
            elif parts[-2] == "bn":
                tname = {"scale": "weight", "bias": "bias",
                         "mean": "running_mean", "var": "running_var"}[parts[-1]]
                sd[".".join(parts[:-1]) + f".{tname}"] = arr
            elif parts[0] == "fc":
                sd["fc.weight" if parts[-1] == "kernel" else "fc.bias"] = (
                    arr.T if parts[-1] == "kernel" else arr)

    walk(v["params"], "", sd)
    walk(v["batch_stats"], "", sd)
    out = convert_torch_state_dict(sd)
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, v)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, out)
    assert ref_shapes == got_shapes
    # spot-check a value survives the double transpose
    a = np.asarray(v["params"]["Mixed_5b"]["branch1x1"]["conv"]["kernel"])
    b = np.asarray(out["params"]["Mixed_5b"]["branch1x1"]["conv"]["kernel"])
    assert np.array_equal(a, b)


def test_resize_299():
    x = jnp.zeros((2, 32, 32, 3))
    assert bilinear_resize_299(x).shape == (2, 299, 299, 3)
