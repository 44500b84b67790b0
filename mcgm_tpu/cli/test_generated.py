"""Score generated/created npy dumps.

- ``test_generated``: IS + FID on ``output/npy/generated_{tag}.npy``
  (reference test_generated.py: rescale /255*2-1, drop NaN rows, write
  ``is_generated_{tag}.npy`` / ``fid_generated_{tag}.npy``). ``--raw`` scores
  the real train set instead.
- ``test_created``: DBI on ``created_{tag}.npy`` with labels reconstructed as
  the class sweep, NaN-masked (reference test_created.py:66-75) — writes
  ``dbi_created_{tag}.npy``.
"""

from __future__ import annotations

import numpy as np

from ..config import make_model_tag, process_control
from ..data import fetch_dataset, process_dataset
from ..evals.features import extract_real_features, make_feature_fn
from ..evals.metrics import Metric, dbi
from ..train.loop import apply_family_overrides
from ..utils import load, npy_path, result_path, save
from ._common import parse_cfg


def _load_images(path: str) -> np.ndarray:
    """npy dump [N,C,H,W] in [0,255] → NHWC in [-1,1] with NaN rows dropped."""
    arr = np.asarray(load(path, mode="numpy"), np.float32)
    arr = arr.transpose(0, 2, 3, 1)
    arr = arr / 255.0 * 2.0 - 1.0
    valid = ~np.isnan(arr.reshape(len(arr), -1)).any(axis=1)
    return arr[valid], valid


def score_generated(cfg: dict, tag: str, kind: str = "generated"):
    dataset = fetch_dataset(cfg["data_name"], cfg["subset"],
                            cfg.get("data_dir", "./data"), verbose=False)
    cfg = process_dataset(dataset["train"], cfg)
    if cfg.get("raw"):
        img = dataset["train"].img.astype(np.float32) / 127.5 - 1.0
        valid = np.ones(len(img), bool)
    else:
        img, valid = _load_images(npy_path(cfg, f"{kind}_{tag}"))
    feature_fn = make_feature_fn(cfg)
    if feature_fn is None:
        raise RuntimeError("no feature model available for IS/FID")
    # precomputed real-side stats skip the train-set sweep (analog of
    # reference fid_tf.py:355-357)
    import os

    stats_path = os.path.join(cfg["output_dir"], "fid_stats",
                              f"fid_stats_{cfg['data_name']}_train.npz")
    if os.path.exists(stats_path):
        z = np.load(stats_path)
        metric = Metric(cfg, feature_fn, real_stats=(z["mu"], z["sigma"]))
    else:
        real_features = extract_real_features(feature_fn, dataset["train"].img)
        metric = Metric(cfg, feature_fn, real_features)
    ev = metric.evaluate(["InceptionScore", "FID"], {}, {"img": img})
    save(np.float64(ev["InceptionScore"]), result_path(cfg, f"is_{kind}_{tag}"),
         mode="numpy")
    save(np.float64(ev["FID"]), result_path(cfg, f"fid_{kind}_{tag}"),
         mode="numpy")
    print(f"{tag}: IS={ev['InceptionScore']:.4f} FID={ev['FID']:.4f}")
    return ev


def score_created(cfg: dict, tag: str):
    dataset = fetch_dataset(cfg["data_name"], cfg["subset"],
                            cfg.get("data_dir", "./data"), verbose=False)
    cfg = process_dataset(dataset["train"], cfg)
    img, valid = _load_images(npy_path(cfg, f"created_{tag}"))
    labels = np.tile(np.arange(cfg["classes_size"]), cfg["generate_per_mode"])
    labels = labels[valid]
    value = dbi(img, labels)
    save(np.float64(value), result_path(cfg, f"dbi_created_{tag}"), mode="numpy")
    print(f"{tag}: DBI={value:.4f}")
    return value


def main(kind: str, argv=None, **defaults):
    # standalone scorer follows the official 10-split IS convention
    # (reference metrics_tf/inception_score_tf.py:108-139); --is_splits 1
    # reproduces the in-loop value
    defaults.setdefault("is_splits", 10)
    cfg = parse_cfg(argv, **defaults)
    cfg = apply_family_overrides(process_control(cfg))
    for i in range(cfg.get("num_experiments", 1)):
        seed = cfg["init_seed"] + i
        tag = make_model_tag(cfg, seed)
        print(f"Experiment: {tag}")
        if kind == "created":
            score_created(dict(cfg), tag)
        else:
            score_generated(dict(cfg), tag)


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2:])
