"""Official frozen-TF-GraphDef scorers (the reference's metrics_tf tier).

The reference's "official" IS/FID CLIs score npy dumps through the frozen
2015 inception GraphDef (reference metrics_tf/inception_score_tf.py:143-185
and metrics_tf/fid_tf.py:34-75): import the serialized graph with the batch
dimension rewired to be dynamic (``input_map`` on ``ExpandDims:0`` + output
shape loosening), read ``pool_3:0`` activations, and recompute softmax from
pool_3 through the graph's own ``softmax/logits/MatMul`` weight. This module
is that importer rebuilt on TF2's v1-compat — the graph FILE is the only
thing that cannot be produced offline (its download URL needs egress; same
blocker class as the torchvision weights):

- :func:`build_scorer` — generic frozen-graph import with the reference's
  exact rewiring; returns ``images_u8_nhwc -> (pool3 [N, D], softmax
  [N, K])``. Works against any graph following the 2015 naming contract
  (``ExpandDims``/``pool_3``/``softmax/logits/MatMul``), which the tests
  exercise with a constructed tiny frozen graph.
- :func:`official_inception_score` — the reference's numpy splits-KL with
  (mean, std) (inception_score_tf.py:133-139).
- :func:`activation_statistics` — (mu, sigma) of pool_3 features, the
  payload of ``fid_stats_{data}_train.npz`` (fid_tf.py:355-357).

TensorFlow is imported lazily so the rest of the framework never pays for
(or requires) it.
"""

from __future__ import annotations

import numpy as np

DEFAULT_GRAPH_BASENAME = "classify_image_graph_def.pb"


def _tf1():
    try:
        import tensorflow as tf
    except ImportError as e:  # pragma: no cover - env without TF
        raise RuntimeError(
            "the official TF-graph scorers need tensorflow; use the flax "
            "inception port (evals/inception.py) or classifier features "
            "instead") from e
    return tf, tf.compat.v1


def build_scorer(pb_path: str, batch_size: int = 100):
    """Frozen GraphDef -> ``images_u8_nhwc -> (pool3, softmax)`` callable.

    The import follows reference inception_score_tf.py:143-185 line for
    line: a dynamic-batch placeholder replaces the graph's single-image
    ``ExpandDims:0`` input, every op output whose leading dim is the baked-in
    1 is loosened to None (fid_tf.py:59-74's TF2 variant), ``pool_3:0``
    yields the FID features, and IS probabilities are
    ``softmax(squeeze(pool_3) @ W_logits)`` with the graph's own weight.
    Images: float/uint8 NHWC in [0, 255] (the official CLIs' convention).
    """
    tf, tf1 = _tf1()
    tf1.disable_eager_execution()
    with open(pb_path, "rb") as f:
        pb_bytes = f.read()
    graph = tf1.Graph()
    with graph.as_default():
        input_tensor = tf1.placeholder(tf.float32, [None, None, None, None],
                                       name="InputTensor")
        graph_def = tf1.GraphDef()
        graph_def.ParseFromString(pb_bytes)
        tf1.import_graph_def(graph_def, name="",
                             input_map={"ExpandDims:0": input_tensor})
        pool3 = graph.get_tensor_by_name("pool_3:0")
        for op in graph.get_operations():
            for o in op.outputs:
                shape = o.get_shape()
                if shape._dims is not None:
                    dims = [d for d in shape]
                    new_shape = [None if (j == 0 and s == 1) else s
                                 for j, s in enumerate(dims)]
                    o.__dict__["_shape_val"] = tf.TensorShape(new_shape)
        w = graph.get_operation_by_name("softmax/logits/MatMul").inputs[1]
        logits = tf1.matmul(tf1.squeeze(pool3, [1, 2]), w)
        softmax = tf1.nn.softmax(logits)

    def scorer(images: np.ndarray):
        images = np.asarray(images, np.float32)
        assert images.ndim == 4, "NHWC [0,255] expected"
        feats, probs = [], []
        with tf1.Session(graph=graph) as sess:
            for i in range(0, len(images), batch_size):
                p3, sm = sess.run(
                    [pool3, softmax],
                    {"InputTensor:0": images[i:i + batch_size]})
                feats.append(p3.reshape(p3.shape[0], -1))
                probs.append(sm)
        return np.concatenate(feats), np.concatenate(probs)

    return scorer


def official_inception_score(probs: np.ndarray, splits: int = 10):
    """(mean, std) over splits — reference inception_score_tf.py:133-139."""
    probs = np.asarray(probs, np.float64)
    scores = []
    n = probs.shape[0]
    for i in range(splits):
        part = probs[i * n // splits: (i + 1) * n // splits]
        # the reference takes log(part) raw; the pretrained graph never
        # emits exact zeros, but saturated logits can — clamp like the
        # in-loop scorer (evals/metrics.py inception_score) so 0*log(0)
        # contributes 0 instead of NaN
        kl = part * (np.log(np.maximum(part, 1e-16))
                     - np.log(np.maximum(part.mean(0, keepdims=True),
                                         1e-16)))
        scores.append(np.exp(kl.sum(1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def activation_statistics(feats: np.ndarray):
    """(mu, sigma) of pool_3 features — fid_tf.py calculate_activation_
    statistics; saved as the precomputed real-side stats npz."""
    feats = np.asarray(feats, np.float64)
    return feats.mean(0), np.cov(feats, rowvar=False)
