"""End-to-end reference-CLI chain, run as REAL subprocesses.

test_shims.py proves the root scripts exist and compile; this file proves a
reference user's actual workflow runs: ``train_vae.py`` → ``test_vae.py`` →
``generate.py`` → ``process.py`` → ``summary.py`` as separate OS processes
(reference workflow: src/make.py emits exactly these commands; src/process.py
aggregates the results). Uses the two CLI extensions that make this hermetic:
``--config`` (custom base YAML, the analog of editing src/config.yml) and a
live ``device: cpu`` key (JAX platform pinned before first backend use).
"""

import json
import os
import subprocess
import sys

import yaml

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = 900


def _write_tiny_config(tmp_path) -> str:
    with open(os.path.join(ROOT, "mcgm_tpu", "config.yml")) as f:
        cfg = yaml.safe_load(f)
    cfg.update({
        "device": "cpu",
        "data_name": "Synthetic",
        "num_epochs": 1,
        "batch_size": {"train": 16, "test": 16},
        "limit_train_batches": 4,
        "limit_eval_batches": 3,
        "steps_per_dispatch": 2,
        "log_interval": 1.0,
        "derive_model_params": False,
        "vae": {"hidden_size": [8, 16, 32], "latent_size": 16,
                "num_res_block": 1, "embedding_size": 8},
        "save_npy": True,
        "save_img": False,
        "output_dir": str(tmp_path / "output"),
        "data_dir": str(tmp_path / "data"),
    })
    path = str(tmp_path / "tiny_config.yml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _run(script, *flags, timeout=TIMEOUT):
    cmd = [sys.executable, os.path.join(ROOT, script), *flags]
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                          timeout=timeout)
    assert proc.returncode == 0, (
        f"{' '.join(cmd)} failed rc={proc.returncode}\n"
        f"--- stdout ---\n{proc.stdout[-4000:]}\n"
        f"--- stderr ---\n{proc.stderr[-4000:]}")
    return proc


def test_make_seed_parallel_emission(tmp_path):
    """make.py --seed_parallel collapses each cell's per-seed train jobs
    into ONE vmapped command (train/seed_parallel.py) and leaves test jobs
    per-seed; non-contiguous seeds and the gan family are refused."""
    _run("make.py", "--run", "train", "--model", "vae", "--data", "Synthetic",
         "--init_seeds", "3", "4", "5", "--seed_parallel",
         "--out_dir", str(tmp_path))
    with open(tmp_path / "train_vae.sh") as f:
        cmds = [l for l in f if l.startswith("python")]
    assert len(cmds) == 2  # one per variant (cvae, mcvae), not per seed
    for c in cmds:
        assert "--init_seed 3" in c and "--num_experiments 3" in c
        assert "--seed_parallel True" in c
    _run("make.py", "--run", "test", "--model", "vae", "--data", "Synthetic",
         "--init_seeds", "3", "4", "5", "--seed_parallel",
         "--out_dir", str(tmp_path))
    with open(tmp_path / "test_vae.sh") as f:
        cmds = [l for l in f if l.startswith("python")]
    assert len(cmds) == 6 and not any("seed_parallel" in c for c in cmds)
    for bad in (["--init_seeds", "0", "2"],
                ["--model", "gan", "--init_seeds", "0", "1"]):
        args = ["--run", "train", "--model", "vae", "--data", "Synthetic",
                "--seed_parallel", "--out_dir", str(tmp_path)]
        if bad[0] == "--model":
            args = ["--run", "train", "--data", "Synthetic", *bad,
                    "--seed_parallel", "--out_dir", str(tmp_path)]
        else:
            args += bad
        proc = subprocess.run([sys.executable, os.path.join(ROOT, "make.py"),
                               *args], cwd=ROOT, capture_output=True,
                              text=True, timeout=60)
        assert proc.returncode != 0, args


def test_make_test_official_tf_emission(tmp_path):
    """--official_tf reproduces the reference's scorer split
    (reference make_test.py:12-102): CIFAR10 dumps go through the frozen-
    TF-graph shims (inception_score_tf.py / fid_tf.py npy <tag>), other
    datasets through test_generated; created DBI for all."""
    _run("make_test.py", "--model", "gan", "--data", "CIFAR10", "COIL100",
         "--init_seeds", "0", "--official_tf", "--out_dir", str(tmp_path))
    with open(tmp_path / "test_generated_gan.sh") as f:
        cmds = [l for l in f if l.startswith("python")]
    tf_cmds = [c for c in cmds if "inception_score_tf.py" in c
               or "fid_tf.py" in c]
    assert len(tf_cmds) == 4  # 2 variants x (IS + FID), CIFAR10 only
    assert any("npy generated_0_CIFAR10_label_mcgan_0.5" in c
               for c in tf_cmds)
    assert any("npy generated_0_CIFAR10_label_cgan" in c for c in tf_cmds)
    coil = [c for c in cmds if "COIL100" in c and "test_generated" in c]
    assert len(coil) == 4  # generated + created per variant
    assert sum("created" in c for c in cmds) == 4  # DBI for every cell


def test_reference_cli_chain_subprocess(tmp_path):
    config = _write_tiny_config(tmp_path)
    out = str(tmp_path / "output")
    tag = "0_Synthetic_label_mcvae_0.5"
    common = ("--config", config, "--control_name", "0.5", "--init_seed", "0")

    # 1. train — with the command line EMITTED BY make.py (reference
    #    workflow: src/make.py writes train_vae.sh; a user executes it)
    _run("make.py", "--run", "train", "--model", "vae", "--data", "Synthetic",
         "--extra", f"--config {config}", "--out_dir", str(tmp_path))
    with open(tmp_path / "train_vae.sh") as f:
        emitted = [l.rstrip(" &\n") for l in f
                   if "--model_name mcvae" in l and l.startswith("python")]
    assert len(emitted) == 1, emitted
    cmd = emitted[0].split()[1:]  # strip the leading "python"
    proc = subprocess.run([sys.executable, *cmd], cwd=ROOT, text=True,
                          capture_output=True, timeout=TIMEOUT)
    assert proc.returncode == 0, (proc.stdout[-4000:], proc.stderr[-4000:])
    assert os.path.exists(os.path.join(out, "model", f"{tag}_checkpoint.pkl")) or \
        any(f.startswith(tag) for f in os.listdir(os.path.join(out, "model"))), \
        f"no checkpoint under {out}/model: {os.listdir(os.path.join(out, 'model'))}"

    # 2. re-evaluate best -> output/result/{tag}.pkl (reference test_vae.py)
    _run("test_vae.py", *common)
    result_pkl = os.path.join(out, "result", f"{tag}.pkl")
    assert os.path.exists(result_pkl), os.listdir(os.path.join(out, "result"))

    # 3. class-sweep npy dump (reference generate.py save_npy branch)
    _run("generate.py", *common, "--model_name", "mcvae")
    npy = os.path.join(out, "npy", f"generated_{tag}.npy")
    assert os.path.exists(npy), os.listdir(os.path.join(out, "npy"))
    import numpy as np
    dump = np.load(npy)
    # Synthetic: 10 classes x generate_per_mode 8, NCHW, [0, 255]
    assert dump.shape == (80, 3, 32, 32) and 0.0 <= dump.min() <= dump.max() <= 255.0

    # 4. aggregate across seeds (reference process.py)
    _run("process.py", out)
    with open(os.path.join(out, "processed_result.json")) as f:
        processed = json.load(f)
    cell = "Synthetic_label_mcvae_0.5"
    assert cell in processed, list(processed)
    loss_keys = [k for k in processed[cell] if k.endswith("Loss")]
    assert loss_keys and "mean" in processed[cell][loss_keys[0]]

    # 5. parameter-count table (reference summary.py)
    proc = _run("summary.py", "--config", config, "--control_name", "0.5",
                "--model_name", "mcvae")
    assert "mcvae" in proc.stdout
