"""Feature models for IS / FID.

The reference uses torchvision's pretrained inception_v3 for natural-image
datasets and its own trained 4-conv classifier for COIL100/Omniglot
(reference src/metrics/metrics.py:44-73). Pretrained inception weights are
not downloadable in zero-egress environments, so the resolution order here is:

1. COIL100/Omniglot → the repo-trained classifier checkpoint
   (``0_{data}_{subset}_classifier_best``), same as the reference;
2. any dataset → an InceptionV3 port IF a converted weight file exists at
   ``{output_dir}/inception/inception_v3.pkl`` (see ``evals.inception``);
3. fallback → the trained classifier checkpoint for that dataset, if present
   (classifier-feature IS/FID: same formulas, features from our classifier —
   values are not comparable with inception-based numbers across codebases
   but are internally consistent for c-vs-mc comparisons);
4. otherwise None (callers skip IS/FID and say so).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..io.checkpoint import load_checkpoint
from ..models.classifier import Classifier


def classifier_feature_fn(cfg: dict, variables) -> callable:
    """Build ``img -> (features, probs)`` from classifier variables."""
    model = Classifier(tuple(cfg["data_shape"]), tuple(cfg["classifier"]["hidden_size"]),
                       cfg["classes_size"])

    @jax.jit
    def fn(img):
        feats = model.apply(variables, img, train=False, feature_only=True)
        logits = model.apply(variables, {"img": img}, train=False)["label"]
        return feats, jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return fn


def classifier_tag(cfg: dict) -> str:
    """reference metrics.py:50-52 tag convention (seed 0)."""
    parts = ["0", cfg["data_name"], cfg["subset"], "classifier"]
    return "_".join(p for p in parts if p)


def make_feature_fn(cfg: dict, verbose: bool = True):
    """Resolve a feature model per the priority above; None if unavailable."""
    # 1/3. classifier checkpoint
    tag = classifier_tag(cfg)
    ckpt = load_checkpoint(cfg, tag, "best")
    use_classifier_first = cfg["data_name"] in ("COIL100", "Omniglot")
    inception_path = os.path.join(cfg["output_dir"], "inception", "inception_v3.pkl")

    def try_inception():
        if os.path.exists(inception_path):
            from .inception import inception_feature_fn

            return inception_feature_fn(inception_path)
        return None

    def try_classifier():
        if ckpt is not None:
            return classifier_feature_fn(cfg, ckpt["model_dict"])
        return None

    order = ([try_classifier, try_inception] if use_classifier_first
             else [try_inception, try_classifier])
    for t in order:
        fn = t()
        if fn is not None:
            return fn
    if verbose:
        print(f"no feature model available for {cfg['data_name']} "
              f"(train a classifier first: tag {tag}); IS/FID will be skipped")
    return None


def extract_real_features(feature_fn, images_u8: np.ndarray,
                          batch_size: int = 256) -> np.ndarray:
    """Features of the real train set (for FID's real-side Gaussian).

    Mirrors reference metrics.py:86-135 but computed once and cached by the
    caller (the reference re-sweeps the train set inside every FID call).
    """
    feats = []
    for i in range(0, len(images_u8), batch_size):
        img = jnp.asarray(images_u8[i:i + batch_size], jnp.float32) / 127.5 - 1.0
        f, _ = feature_fn(img)
        feats.append(np.asarray(f))
    return np.concatenate(feats)
