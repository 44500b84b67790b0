"""Official TF-GraphDef scorer tier (evals/tf_graph.py, cli/score_tf.py).

The 2015 inception graph FILE needs egress to obtain, but the importer and
scoring conventions are fully testable offline against a constructed tiny
frozen graph that follows the 2015 naming contract
(``ExpandDims``/``pool_3``/``softmax/logits/MatMul`` — reference
metrics_tf/inception_score_tf.py:143-185): the batch-dim rewiring, pool_3
feature extraction, softmax-from-pool3 recomputation, splits-KL IS, stats
npz, and the npy->result CLI round trip all run for real.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")


@pytest.fixture(scope="module")
def tiny_graph_pb(tmp_path_factory):
    """Frozen GraphDef with the 2015 contract: batch-1 input named
    ExpandDims, a conv trunk, pool_3 [1,1,1,D], softmax/logits/MatMul."""
    tf1 = tf.compat.v1
    tf1.disable_eager_execution()
    rng = np.random.default_rng(0)
    g = tf1.Graph()
    with g.as_default():
        x = tf1.placeholder(tf.float32, [1, None, None, 3], name="input_img")
        e = tf1.identity(x, name="ExpandDims")
        w = tf1.constant(rng.standard_normal((3, 3, 3, 6)).astype(np.float32)
                         * 0.1)
        c = tf1.nn.relu(tf1.nn.conv2d(e, w, strides=[1, 2, 2, 1],
                                      padding="SAME"))
        tf1.reduce_mean(c, axis=[1, 2], keepdims=True, name="pool_3")
        fcw = tf1.constant(rng.standard_normal((6, 5)).astype(np.float32))
        sq = tf1.squeeze(g.get_tensor_by_name("pool_3:0"), [1, 2])
        tf1.matmul(sq, fcw, name="softmax/logits/MatMul")
    path = str(tmp_path_factory.mktemp("tfgraph") /
               "classify_image_graph_def.pb")
    with open(path, "wb") as f:
        f.write(g.as_graph_def().SerializeToString())
    return path


def test_build_scorer_rewires_batch_dim(tiny_graph_pb):
    """A graph frozen at batch 1 must accept arbitrary batches after the
    reference's input_map + shape-loosening import."""
    from mcgm_tpu.evals.tf_graph import build_scorer

    scorer = build_scorer(tiny_graph_pb, batch_size=4)
    imgs = np.random.default_rng(1).uniform(
        0, 255, (10, 16, 16, 3)).astype(np.float32)
    feats, probs = scorer(imgs)
    assert feats.shape == (10, 6)
    assert probs.shape == (10, 5)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)
    # softmax really is recomputed from pool_3 through the graph's weight:
    # identical images -> identical rows regardless of batch position
    f2, p2 = scorer(imgs[[3, 3, 3]])
    np.testing.assert_allclose(p2[0], probs[3], rtol=1e-5)
    np.testing.assert_allclose(f2[0], feats[3], rtol=1e-5)


def test_official_is_matches_reference_formula():
    """splits-KL (mean, std) — reference inception_score_tf.py:133-139."""
    from mcgm_tpu.evals.tf_graph import official_inception_score

    rng = np.random.default_rng(2)
    probs = rng.dirichlet(np.ones(5), size=40)
    mean, std = official_inception_score(probs, splits=4)
    # hand-rolled reference loop
    scores = []
    for i in range(4):
        part = probs[i * 10:(i + 1) * 10]
        kl = part * (np.log(part) - np.log(np.expand_dims(part.mean(0), 0)))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    assert abs(mean - np.mean(scores)) < 1e-12
    assert abs(std - np.std(scores)) < 1e-12
    # uniform predictions -> IS exactly 1
    m1, _ = official_inception_score(np.full((20, 5), 0.2), splits=1)
    assert abs(m1 - 1.0) < 1e-9


def test_score_tf_cli_round_trip(tiny_graph_pb, tmp_path):
    """npy dump -> is/fid/stats results through the CLI, reference artifact
    names (is_{tag}.npy / fid_{tag}.npy, NaN rows dropped)."""
    from mcgm_tpu.cli.score_tf import main as score_main

    tmp = str(tmp_path)
    rng = np.random.default_rng(3)
    tag = "generated_0_Synthetic_label_mcvae_0.5"
    os.makedirs(os.path.join(tmp, "npy"))
    dump = rng.uniform(0, 255, (20, 3, 16, 16)).astype(np.float32)
    dump[7] = np.nan  # glow-style NaN row must be dropped, not scored
    np.save(os.path.join(tmp, "npy", f"{tag}.npy"), dump)
    # real-side dump for the stats kind
    real_tag = "generated_0_Synthetic"
    np.save(os.path.join(tmp, "npy", f"{real_tag}.npy"),
            rng.uniform(0, 255, (30, 3, 16, 16)).astype(np.float32))

    common = dict(output_dir=tmp, device="cpu", tf_graph=tiny_graph_pb,
                  data_name="Synthetic")
    mean, std = score_main("is", ["npy", tag], **common)
    is_file = os.path.join(tmp, "result", f"is_{tag}.npy")
    assert np.isfinite(np.load(is_file)) and float(np.load(is_file)) == mean

    score_main("stats", ["npy", real_tag], **common)
    stats = np.load(os.path.join(tmp, "fid_stats_tf",
                                 "fid_stats_Synthetic_train.npz"))
    assert stats["mu"].shape == (6,) and stats["sigma"].shape == (6, 6)

    fid = score_main("fid", ["npy", tag], **common)
    fid_file = os.path.join(tmp, "result", f"fid_{tag}.npy")
    assert np.isfinite(np.load(fid_file)) and float(np.load(fid_file)) == fid
    assert fid >= 0.0

    # scoring the real dump against its own stats -> FID ~ 0
    fid_self = score_main("fid", ["npy", real_tag], **common)
    assert abs(fid_self) < 1e-3


def test_missing_graph_fails_fast(tmp_path):
    from mcgm_tpu.cli.score_tf import main as score_main

    os.makedirs(os.path.join(str(tmp_path), "npy"))
    np.save(os.path.join(str(tmp_path), "npy", "generated_0_X.npy"),
            np.zeros((2, 3, 8, 8), np.float32))
    with pytest.raises(FileNotFoundError, match="GraphDef not found"):
        score_main("is", ["npy", "generated_0_X"],
                   output_dir=str(tmp_path), device="cpu")
