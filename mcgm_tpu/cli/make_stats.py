"""Real-data scoring assets.

Equivalents of the reference metrics_tf side tools:
- ``dump``: write the real train set as ``output/npy/generated_0_{data}.npy``
  in [0,255] NCHW (reference metrics_tf/generate_tf.py:43-52) so the raw set
  can be scored like a generated dump;
- ``stats``: precompute the FID real-side feature Gaussian
  (mu, sigma) to ``output/fid_stats/fid_stats_{data}_train.npz``
  (reference fid_tf.py:355-357 loads exactly such a file), so per-epoch FID
  never re-sweeps the train set.
"""

from __future__ import annotations

import os

import numpy as np

from ..data import fetch_dataset, process_dataset
from ..evals.features import extract_real_features, make_feature_fn
from ..utils import makedir_exist_ok, npy_path, save
from ._common import parse_cfg
from ..config import process_control


def dump_real(cfg: dict):
    dataset = fetch_dataset(cfg["data_name"], cfg["subset"],
                            cfg.get("data_dir", "./data"))
    img = dataset["train"].img.astype(np.float32)  # already [0,255] uint8
    save(img.transpose(0, 3, 1, 2), npy_path(cfg, f"generated_0_{cfg['data_name']}"),
         mode="numpy")
    print(f"dumped {len(img)} real images")


def make_fid_stats(cfg: dict):
    dataset = fetch_dataset(cfg["data_name"], cfg["subset"],
                            cfg.get("data_dir", "./data"))
    cfg = process_dataset(dataset["train"], cfg)
    feature_fn = make_feature_fn(cfg)
    if feature_fn is None:
        raise RuntimeError("no feature model available")
    feats = extract_real_features(feature_fn, dataset["train"].img)
    out = os.path.join(cfg["output_dir"], "fid_stats",
                       f"fid_stats_{cfg['data_name']}_train.npz")
    makedir_exist_ok(os.path.dirname(out))
    np.savez(out, mu=feats.mean(0), sigma=np.cov(feats, rowvar=False))
    print(f"wrote {out} ({feats.shape[0]} x {feats.shape[1]} features)")


def main(kind: str, argv=None, **defaults):
    cfg = parse_cfg(argv, **defaults)
    cfg = process_control(cfg)
    if kind == "dump":
        dump_real(cfg)
    elif kind == "stats":
        make_fid_stats(cfg)
    else:
        raise ValueError(kind)


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2:])
