"""Test harness: force CPU with 8 virtual devices (the TPU-world substitute
for multi-chip tests — SURVEY.md §4) and provide tiny-config helpers.

NOTE: this environment pins JAX_PLATFORMS=axon (a tunneled TPU) at the
process level and the plugin ignores the env var, so the CPU override must go
through jax.config before any backend use.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# NOTE: --xla_backend_optimization_level=0 was evaluated for this harness: it
# cuts the fused-GAN-step compile from ~15 min to <1 min on this single-core
# host but makes generated code degenerately slow at runtime (the training /
# workflow tests more than give the savings back). Full optimization it is.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence XLA AOT-cache logs

import jax

jax.config.update("jax_platforms", "cpu")
# NOTE: the persistent compilation cache is deliberately NOT enabled here —
# measured on this host, XLA:CPU AOT cache loads are slower than recompiling
# (and warn about target-feature mismatches).

import copy

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# importlib import-mode (pytest.ini) doesn't auto-add the test dir; tests
# import helpers by bare name (`from conftest import make_tiny_cfg`).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mcgm_tpu.config import apply_control_name, load_config, process_control


def make_tiny_cfg(model_name: str, data_name: str = "Synthetic",
                  control_name: str = "0.5", tmp_dir: str = "/tmp/mcgm_test",
                  **overrides) -> dict:
    cfg = load_config()
    cfg = apply_control_name(cfg, control_name)
    cfg.update(dict(
        data_name=data_name, model_name=model_name, output_dir=tmp_dir,
        num_epochs=1, derive_batch_size=False,
        batch_size={"train": 16, "test": 16}, log_interval=1.0,
        limit_train_batches=4, limit_eval_batches=3,
        # d_iter=2 keeps the scanned-D-step structure while halving the
        # per-step work; the scan body compiles once either way
        d_iter=2,
    ))
    cfg.update(overrides)
    cfg = process_control(cfg)
    # shrink every family to test size; derive_model_params=False stops
    # Experiment's process_control pass from re-deriving the full-size dicts
    cfg["derive_model_params"] = False
    cfg["vae"] = {"hidden_size": [8, 16, 32], "latent_size": 16,
                  "num_res_block": 1, "embedding_size": 8}
    cfg["gan"] = {"latent_size": 16, "generator_hidden_size": [16, 16, 16, 16],
                  "discriminator_hidden_size": [16, 16, 16, 16],
                  "embedding_size": 8}
    # scan_flows=False here: XLA:CPU compiles grad-through-scan pathologically
    # slowly (the TPU path with scan is validated separately; see
    # tests/test_glow_scan.py for the scan-path unit tests, which run eagerly)
    cfg["glow"] = {"hidden_size": 16, "K": 2, "L": 3, "affine": True,
                   "conv_lu": True, "scan_flows": False}
    cfg["vqvae"] = {"hidden_size": [16, 16], "num_res_block": 1,
                    "embedding_size": 8, "num_embedding": 32,
                    "vq_commit": 0.25}
    cfg["pixelcnn"] = {"num_layer": 3, "hidden_size": 16, "num_embedding": 32}
    cfg["classifier"] = {"hidden_size": [4, 8, 8, 8]}
    return cfg


@pytest.fixture
def tiny_cfg():
    return make_tiny_cfg


@pytest.fixture
def tmp_output(tmp_path):
    return str(tmp_path)
