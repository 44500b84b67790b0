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


def test_full_net_matches_torch_replica():
    """Whole-net cross-implementation check: the flax port and the torch
    functional replica (fixture_utils.torch_inception_apply) run from the
    SAME weights must produce the same features and logits — every conv
    padding, BN eps, pool flavor and concat order in the trunk."""
    import torch

    from fixture_utils import make_random_inception, torch_inception_apply

    model, variables, x = make_random_inception(seed=5)
    feats_j, logits_j = model.apply(variables, x)
    xt = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    feats_t, logits_t = torch_inception_apply(variables, xt)
    np.testing.assert_allclose(np.asarray(feats_j), feats_t.numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.numpy(),
                               atol=5e-3, rtol=1e-3)


def test_scoring_pipeline_cross_impl_parity():
    """The offline FID/IS-parity loop (round-3 verdict #2): run the FULL
    scoring pipeline twice from the same random inception weights —

    - torch side: the reference's exact math (bilinear 299 upsample →
      inception forward → softmax IS via kl_div batchmean, pool3-feature
      FID via np.cov + scipy sqrtm with the jitter/imag guards; reference
      src/metrics/metrics.py:63-81, 110-160) on a functional replica;
    - jax side: our evals pipeline (bilinear_resize_299 →
      InceptionV3.apply → batched_feature_probs → inception_score /
      frechet_distance) on the flax port

    — and assert the SCORES agree. This proves the scoring pipeline (not
    just single activations) is implementation-equal, so the only open
    risk for inception-IS/FID parity is obtaining the pretrained weight
    file itself (unobtainable in this zero-egress environment)."""
    import scipy.linalg
    import torch
    import torch.nn.functional as F

    from fixture_utils import make_random_inception, torch_inception_apply
    from mcgm_tpu.evals.inception import bilinear_resize_299
    from mcgm_tpu.evals.metrics import (batched_feature_probs,
                                        frechet_distance, inception_score)

    model, variables, _ = make_random_inception(seed=7)
    rng = np.random.default_rng(11)
    N = 64
    real = rng.uniform(-1, 1, (N, 32, 32, 3)).astype(np.float32)
    gen = np.clip(0.8 * real + rng.normal(0, 0.2, real.shape), -1,
                  1).astype(np.float32)

    # ---------------- jax pipeline (ours)
    def feature_fn(img):
        x = bilinear_resize_299(img)
        feats, logits = model.apply(variables, x)
        return feats, jax.nn.softmax(logits, axis=-1)

    feature_fn = jax.jit(feature_fn)
    rf_j, _ = batched_feature_probs(feature_fn, real, batch_size=16)
    gf_j, gp_j = batched_feature_probs(feature_fn, gen, batch_size=16)
    is_j = inception_score(gp_j, splits=1)

    def stats(f):
        return f.mean(0), np.cov(f, rowvar=False)

    fid_j = frechet_distance(*stats(rf_j), *stats(gf_j), method="scipy")
    fid_j_eigh = frechet_distance(*stats(rf_j), *stats(gf_j), method="eigh")

    # ---------------- torch pipeline (reference math)
    def torch_feats(imgs):
        fs, ps = [], []
        for i in range(0, len(imgs), 16):
            xt = torch.tensor(imgs[i:i + 16].transpose(0, 3, 1, 2))
            xt = F.interpolate(xt, size=(299, 299), mode="bilinear",
                               align_corners=False)
            f, l = torch_inception_apply(variables, xt)
            fs.append(f.numpy())
            ps.append(F.softmax(l, dim=-1).numpy())
        return np.concatenate(fs), np.concatenate(ps)

    rf_t, _ = torch_feats(real)
    gf_t, gp_t = torch_feats(gen)
    # reference IS, splits=1 (metrics.py:75-81)
    part = torch.tensor(gp_t)
    py = part.mean(dim=0)
    is_t = float(F.kl_div(py.log().view(1, -1).expand_as(part), part,
                          reduction="batchmean").exp())
    # reference FID (metrics.py:135-160)
    mu1, s1 = stats(rf_t)
    mu2, s2 = stats(gf_t)
    covmean, _ = scipy.linalg.sqrtm(s1.dot(s2), disp=False)
    if not np.isfinite(covmean).all():
        off = np.eye(s1.shape[0]) * 1e-6
        covmean = scipy.linalg.sqrtm((s1 + off).dot(s2 + off))
    if np.iscomplexobj(covmean):
        assert np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3)
        covmean = covmean.real
    diff = mu1 - mu2
    fid_t = float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                  - 2 * np.trace(covmean))

    assert abs(is_t - is_j) < 1e-3 * max(1.0, abs(is_t)), (is_t, is_j)
    assert abs(fid_t - fid_j) < max(0.1, 1e-3 * abs(fid_t)), (fid_t, fid_j)
    # the fast on-device eigh form used in-loop agrees with the reference's
    # scipy form on the same features
    assert abs(fid_t - fid_j_eigh) < max(0.1, 2e-3 * abs(fid_t)), (
        fid_t, fid_j_eigh)


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
