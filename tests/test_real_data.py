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


def test_remaining_families_on_real_pixels(tmp_path):
    """Round-4 verdict #4: gan/glow/pixelcnn/vqvae had never seen a real
    image. Train each on the vendored digits shard (the reference's canon
    trains every family on real data, src/data.py:9-62): vqvae -> frozen-AE
    mcpixelcnn, mcgan incl. the in-loop IS/FID eval sweep + the
    generate->test_generated scoring chain, mcglow at 1 channel @ 32px,
    then aggregate everything with process.py."""
    tmp = str(tmp_path / "out")
    data_dir = str(tmp_path / "data")
    _stage_dataset(data_dir)

    def tiny_of(fam):
        return _cfg("mcvae", tmp, data_dir)[fam]

    # feature model for the GAN's in-loop IS/FID (features.py resolves
    # 0_MNIST_label_classifier_best)
    Experiment(_cfg("classifier", tmp, data_dir, control_name="None",
                    num_epochs=1)).run()

    # vqvae (unconditioned, reference make.py:51-54) -> frozen-AE pixelcnn
    lg_vq = Experiment(_cfg("vqvae", tmp, data_dir,
                            control_name="None")).run()
    assert np.isfinite(lg_vq.history["test/MSE"][-1])
    lg_pix = Experiment(_cfg("mcpixelcnn", tmp, data_dir)).run()
    assert np.isfinite(lg_pix.history["test/NLL"][-1])

    # glow on real 1-channel pixels
    lg_glow = Experiment(_cfg("mcglow", tmp, data_dir,
                              num_init_batches=2)).run()
    assert np.isfinite(lg_glow.history["test/Loss"][-1]), \
        "glow diverged on real pixels"

    # gan, with the per-epoch fixed-z IS/FID eval running against the real
    # classifier features
    lg_gan = Experiment(_cfg("mcgan", tmp, data_dir, d_iter=2)).run()
    assert np.isfinite(lg_gan.history["train/Loss_G"][-1])
    assert np.isfinite(lg_gan.history["test/InceptionScore"][-1])
    assert np.isfinite(lg_gan.history["test/FID"][-1])

    # score generated GAN samples through the npy chain on real-side stats
    from mcgm_tpu.cli.sample import main as sample_main
    from mcgm_tpu.cli.test_generated import main as test_generated_main

    tiny = _cfg("mcgan", tmp, data_dir)
    argv = ["--control_name", "0.5"]
    common = dict(data_name="MNIST", model_name="mcgan", output_dir=tmp,
                  data_dir=data_dir, device="cpu",
                  derive_model_params=False, gan=tiny["gan"],
                  classifier=tiny["classifier"],
                  batch_size={"train": 128, "test": 256})
    sample_main("generate", argv, save_npy=True, generate_per_mode=20,
                **common)
    test_generated_main("generated", argv, generate_per_mode=20, **common)
    is_v = np.load(os.path.join(
        tmp, "result", "is_generated_0_MNIST_label_mcgan_0.5.npy"))
    assert np.isfinite(is_v)

    # re-evaluate each stateful family from _best (reference test_*.py flow)
    from mcgm_tpu.cli.test_model import main as test_model_main

    for model, extra in (
        ("vqvae", dict(control_name_kw="None", vqvae=tiny_of("vqvae"))),
        ("mcpixelcnn", dict(pixelcnn=tiny_of("pixelcnn"),
                            vqvae=tiny_of("vqvae"))),
        ("mcglow", dict(glow=tiny_of("glow"))),
    ):
        cn = extra.pop("control_name_kw", "0.5")
        test_model_main(["--control_name", cn], data_name="MNIST",
                        model_name=model, output_dir=tmp, data_dir=data_dir,
                        device="cpu", derive_model_params=False,
                        batch_size={"train": 128, "test": 256}, **extra)

    # aggregate all families' real-pixel artifacts
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run([sys.executable, os.path.join(repo, "process.py"), tmp],
                   check=True, cwd=repo)
    with open(os.path.join(tmp, "processed_result.json")) as f:
        processed = json.load(f)
    for fam in ("vqvae", "mcpixelcnn", "mcglow", "mcgan"):
        assert any(fam in cell for cell in processed), processed.keys()
