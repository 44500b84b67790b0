"""End-to-end on REAL pixels (round-3 verdict #8).

Every other e2e artifact runs on the Synthetic blobs because the
reference's canonical datasets are not downloadable here (zero egress).
This file drives the framework on genuinely real images — the vendored
UCI handwritten-digits shard (tests/fixtures/real_digits_shard.npz,
tools/make_digits_shard.py) — staged through the framework's custom-data
contract (``processed/{split}.npz`` under the data root, data/datasets.py)
under the MNIST dataset name, so the loader, training, generation, the
FID-stats pipeline and the scoring CLIs all touch real pixels at least
once:

  stage shard -> train classifier (the IS/FID feature model,
  reference metrics.py:49-62) -> train mcvae -> test_model ->
  generate --save_npy (the 10x1000 class sweep, reference
  generate.py:59-74) -> make_stats dump+stats (reference
  metrics_tf/generate_tf.py + fid_tf.py:355-357) -> test_generated
  (IS/FID on the dump) -> process.py aggregation.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import make_tiny_cfg
from mcgm_tpu.train.loop import Experiment

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "real_digits_shard.npz")


def _stage_dataset(data_dir: str):
    """Place the real shard as MNIST processed npzs (train 1297 / test 500)."""
    with np.load(FIXTURE) as z:
        img, labels = z["img"], z["labels"]
    assert img.dtype == np.uint8 and img.shape[1:] == (32, 32, 1)
    root = os.path.join(data_dir, "MNIST", "processed")
    os.makedirs(root, exist_ok=True)
    meta = json.dumps({"classes": [str(i) for i in range(10)]})
    meta_arr = np.frombuffer(meta.encode(), np.uint8)
    np.savez_compressed(os.path.join(root, "train.npz"), img=img[:1297],
                        labels=labels[:1297], meta=meta_arr)
    np.savez_compressed(os.path.join(root, "test.npz"), img=img[1297:],
                        labels=labels[1297:], meta=meta_arr)


def _cfg(model, tmp, data_dir, **over):
    return make_tiny_cfg(model, data_name="MNIST", tmp_dir=tmp,
                         data_dir=data_dir, batch_size={"train": 128,
                                                        "test": 256},
                         limit_train_batches=None, limit_eval_batches=None,
                         **over)


def test_full_chain_on_real_pixels(tmp_path):
    tmp = str(tmp_path / "out")
    data_dir = str(tmp_path / "data")
    _stage_dataset(data_dir)

    # 1. classifier on real digits: must actually LEARN (real signal, not
    #    blobs) — it becomes the IS/FID feature model for this dataset
    exp = Experiment(_cfg("classifier", tmp, data_dir, control_name="None",
                          num_epochs=3))
    logger = exp.run()
    acc = logger.history["test/Accuracy"][-1]
    assert acc > 60.0, f"classifier failed to learn real digits: {acc}"

    # 2. generative model on the real images
    Experiment(_cfg("mcvae", tmp, data_dir, num_epochs=1)).run()

    # 3. re-evaluate from _best (reference test_vae.py flow)
    from mcgm_tpu.cli.test_model import main as test_model_main

    test_model_main(["--control_name", "0.5"], data_name="MNIST",
                    model_name="mcvae", output_dir=tmp, data_dir=data_dir,
                    device="cpu", derive_model_params=False,
                    vae=_cfg("mcvae", tmp, data_dir)["vae"],
                    batch_size={"train": 128, "test": 256})
    assert os.path.exists(os.path.join(
        tmp, "result", "0_MNIST_label_mcvae_0.5.pkl"))

    # 4. the class-sweep npy dump (10 modes x generate_per_mode=1000 —
    #    the reference MNIST protocol, utils.py:107-110)
    from mcgm_tpu.cli.sample import main as sample_main

    argv = ["--control_name", "0.5"]
    tiny = _cfg("mcvae", tmp, data_dir)
    common = dict(data_name="MNIST", model_name="mcvae",
                  output_dir=tmp, data_dir=data_dir, device="cpu",
                  derive_model_params=False, vae=tiny["vae"],
                  classifier=tiny["classifier"],  # the feature model's dims
                  batch_size={"train": 128, "test": 256})
    sample_main("generate", argv, save_npy=True, **common)
    npy = os.path.join(tmp, "npy", "generated_0_MNIST_label_mcvae_0.5.npy")
    dump = np.load(npy)
    assert dump.shape == (10000, 1, 32, 32)  # NCHW [0,255] like the ref

    # 5. real-side scoring assets (reference metrics_tf equivalents)
    from mcgm_tpu.cli.make_stats import main as make_stats_main

    make_stats_main("dump", argv, **common)
    real_npy = os.path.join(tmp, "npy", "generated_0_MNIST.npy")
    assert np.load(real_npy).shape == (1297, 1, 32, 32)
    make_stats_main("stats", argv, **common)
    stats = np.load(os.path.join(tmp, "fid_stats",
                                 "fid_stats_MNIST_train.npz"))
    assert stats["mu"].ndim == 1 and stats["sigma"].ndim == 2
    assert np.isfinite(stats["mu"]).all()

    # 6. IS/FID on the generated dump with classifier features
    from mcgm_tpu.cli.test_generated import main as test_generated_main

    test_generated_main("generated", argv, **common)
    is_v = np.load(os.path.join(
        tmp, "result", "is_generated_0_MNIST_label_mcvae_0.5.npy"))
    fid_v = np.load(os.path.join(
        tmp, "result", "fid_generated_0_MNIST_label_mcvae_0.5.npy"))
    assert np.isfinite(is_v) and 1.0 <= float(is_v) <= 10.0
    assert np.isfinite(fid_v) and float(fid_v) >= 0.0

    # 7. aggregate everything written above (reference process.py)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, os.path.join(repo, "process.py"), tmp],
                   check=True, cwd=repo)
    with open(os.path.join(tmp, "processed_result.json")) as f:
        processed = json.load(f)
    assert any("mcvae" in cell for cell in processed)
