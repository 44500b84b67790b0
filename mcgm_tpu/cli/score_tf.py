"""Official TF-graph IS / FID CLIs (reference metrics_tf equivalents).

Reference invocations and their equivalents here:

  python ./metrics_tf/inception_score_tf.py npy <tag>
    -> python inception_score_tf.py npy <tag> [--output_dir ...]
  python ./metrics_tf/fid_tf.py npy <tag>
    -> python fid_tf.py npy <tag> [--output_dir ...]

Both read ``output/npy/{tag}.npy`` (NCHW floats in [0, 255], the save_npy
dump format), drop NaN rows (reference inception_score_tf.py:271-272,
fid_tf.py:346-347), run the frozen 2015 inception GraphDef through
``evals.tf_graph.build_scorer`` and write ``output/result/is_{tag}.npy`` /
``fid_{tag}.npy`` scalars exactly like the reference CLIs
(inception_score_tf.py:267-280, fid_tf.py:339-371).

The graph file resolves from ``cfg['tf_graph']`` (default
``{output_dir}/inception/classify_image_graph_def.pb``); its download URL
(reference inception_score_tf.py:101) needs egress, so in offline
environments the CLI fails fast with guidance. ``fid`` consumes the
precomputed real-side stats (``kind='stats'`` writes them from the real
dump — the reference ships these as res/stats_tf npz files,
fid_tf.py:355-357).
"""

from __future__ import annotations

import os

import numpy as np

from ..evals.metrics import frechet_distance
from ..evals.tf_graph import (DEFAULT_GRAPH_BASENAME, activation_statistics,
                              build_scorer, official_inception_score)
from ..utils import makedir_exist_ok, result_path, save
from ._common import parse_cfg


def _resolve_graph(cfg: dict) -> str:
    path = cfg.get("tf_graph") or os.path.join(
        cfg["output_dir"], "inception", DEFAULT_GRAPH_BASENAME)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"frozen inception GraphDef not found at {path}; download "
            f"inception-2015-12-05.tgz (reference "
            f"metrics_tf/inception_score_tf.py:101) on a machine with "
            f"egress, extract {DEFAULT_GRAPH_BASENAME} there, or pass "
            f"--tf_graph PATH")
    return path


def _load_dump(cfg: dict, tag: str) -> np.ndarray:
    path = os.path.join(cfg["output_dir"], "npy", f"{tag}.npy")
    images = np.load(path, allow_pickle=True)
    images = np.transpose(images, (0, 2, 3, 1))  # NCHW dump -> NHWC
    valid = np.sum(np.isnan(images), axis=(1, 2, 3)) == 0
    return images[valid]


def _stats_path(cfg: dict, data_name: str) -> str:
    return os.path.join(cfg["output_dir"], "fid_stats_tf",
                        f"fid_stats_{data_name}_train.npz")


def main(kind: str, argv=None, **defaults):
    argv = list(argv) if argv is not None else None
    tag = None
    if argv and argv[:1] == ["npy"]:
        if len(argv) < 2:
            raise SystemExit("usage: ... npy <tag> [--flags]")
        tag, argv = argv[1], argv[2:]
    defaults.setdefault("is_splits", 1)  # the reference npy-mode default
    cfg = parse_cfg(argv, **defaults)
    if tag is None:
        raise SystemExit("the official TF scorers operate on npy dumps: "
                         "pass 'npy <tag>'")
    scorer = build_scorer(_resolve_graph(cfg))
    images = _load_dump(cfg, tag)
    feats, probs = scorer(images)
    # generated_{seed}_{data}_... -> data name field of the model tag
    # (reference fid_tf.py:343: model_tag.split('_')[2])
    parts = tag.split("_")
    data_name = parts[2] if len(parts) > 2 else cfg["data_name"]
    if kind == "is":
        mean, std = official_inception_score(probs,
                                             int(cfg.get("is_splits", 1)))
        out = result_path(cfg, f"is_{tag}")
        save(np.float64(mean), out, mode="numpy")
        print(f"Inception Score ({tag}): {mean} (std {std})")
        return mean, std
    if kind == "stats":
        mu, sigma = activation_statistics(feats)
        out = _stats_path(cfg, data_name)
        makedir_exist_ok(os.path.dirname(out))
        np.savez(out, mu=mu, sigma=sigma)
        print(f"wrote {out} ({feats.shape[0]} x {feats.shape[1]} features)")
        return out
    if kind == "fid":
        stats_file = cfg.get("fid_stats") or _stats_path(cfg, data_name)
        if not os.path.exists(stats_file):
            raise FileNotFoundError(
                f"real-side stats not found at {stats_file}; produce them "
                f"from the real dump (python -m mcgm_tpu.cli.make_stats "
                f"dump ... first) with: python -m mcgm_tpu.cli.score_tf "
                f"stats npy generated_0_{data_name}, or pass "
                f"--fid_stats PATH")
        with np.load(stats_file) as f:
            mu1, sigma1 = f["mu"], f["sigma"]
        mu2, sigma2 = activation_statistics(feats)
        fid = frechet_distance(mu1, sigma1, mu2, sigma2, method="scipy")
        out = result_path(cfg, f"fid_{tag}")
        save(np.float64(fid), out, mode="numpy")
        print(f"FID ({tag}): {fid}")
        return fid
    raise ValueError(kind)


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2:])
