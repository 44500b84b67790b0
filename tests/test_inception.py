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


def test_resize_matches_torch_bilinear():
    """jax.image.resize bilinear == torch interpolate(align_corners=False)
    — the reference's exact upsample (src/metrics/metrics.py:66)."""
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(bilinear_resize_299(jnp.asarray(x)))
    theirs = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)), size=299,
                           mode="bilinear", align_corners=False)
    np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_inception_a_block_matches_torch():
    """Block-level torch parity: conv padding, BN eps=1e-3, avg_pool
    count_include_pad, concat order — the load-bearing numerics of the
    port — against a functional torch replica with converted weights."""
    import torch
    import torch.nn.functional as F

    from fixture_utils import randomize_variables
    from mcgm_tpu.evals.inception import InceptionA

    m = InceptionA(pool_features=32)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 9, 9, 64)))
    v = randomize_variables(v, seed=3)
    rng = np.random.default_rng(4)
    x = rng.uniform(-1, 1, (2, 9, 9, 64)).astype(np.float32)
    ours = np.asarray(m.apply(v, jnp.asarray(x)))

    def t(a):
        return torch.tensor(np.asarray(a))

    def basic(xt, name, stride=1, padding=0):
        p = v["params"][name]
        s = v["batch_stats"][name]
        w = t(p["conv"]["kernel"]).permute(3, 2, 0, 1)
        xt = F.conv2d(xt, w, stride=stride, padding=padding)
        xt = F.batch_norm(xt, t(s["bn"]["mean"]), t(s["bn"]["var"]),
                          t(p["bn"]["scale"]), t(p["bn"]["bias"]), eps=1e-3)
        return F.relu(xt)

    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    b1 = basic(xt, "branch1x1")
    b5 = basic(basic(xt, "branch5x5_1"), "branch5x5_2", padding=2)
    b3 = basic(basic(basic(xt, "branch3x3dbl_1"), "branch3x3dbl_2",
                     padding=1), "branch3x3dbl_3", padding=1)
    bp = basic(F.avg_pool2d(xt, 3, stride=1, padding=1), "branch_pool")
    theirs = torch.cat([b1, b5, b3, bp], dim=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_golden_activation_pin():
    """Full-net forward pinned to a committed fixture: regenerate the
    deterministic random weights (tests/fixture_utils.py), forward the
    fixed input, and match tools/make_inception_fixture.py's output —
    breaks if the architecture, layer math, or layout assumptions drift."""
    import os

    from fixture_utils import make_random_inception

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "inception_golden.npz")
    z = np.load(path)
    model, variables, x = make_random_inception(seed=0)
    feats, logits = model.apply(variables, x)
    scale = np.abs(z["feats"]).mean()
    np.testing.assert_allclose(np.asarray(feats), z["feats"],
                               atol=2e-3 * scale, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(logits), z["logits"],
                               atol=2e-3 * np.abs(z["logits"]).mean(),
                               rtol=2e-3)
