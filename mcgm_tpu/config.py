"""Configuration system.

The reference keeps a global mutable dict loaded at import time
(reference src/config.py:4-6) that every module mutates freely. Here the
config is an explicit dict built by :func:`load_config`, derived by the pure
function :func:`process_control` (the analog of reference src/utils.py:104-192)
and threaded through the framework by value.
"""

from __future__ import annotations

import copy
import os
import re

import yaml

_DEFAULT_PATH = os.path.join(os.path.dirname(__file__), "config.yml")


def load_config(path: str | None = None, overrides: dict | None = None) -> dict:
    """Load the YAML defaults, apply flat overrides, return a fresh dict."""
    with open(path or _DEFAULT_PATH) as f:
        cfg = yaml.safe_load(f)
    if overrides:
        for k, v in overrides.items():
            if v is not None:
                cfg[k] = v
    return cfg


def apply_control_name(cfg: dict, control_name: str | None) -> dict:
    """Zip a positional ``control_name`` string onto ``cfg['control']`` keys.

    Mirrors the reference CLI convention (reference src/train_gan.py:25-28):
    ``'0.5'`` maps onto the single ``controller_rate`` key; the literal string
    ``'None'`` clears the control dict (used for the embedding-conditioned
    ``c*`` baselines, whose model tag then has no rate suffix).
    """
    cfg = copy.deepcopy(cfg)
    if control_name:
        if control_name == "None":
            cfg["control"] = {}
        else:
            cfg["control"] = {
                k: v for k, v in zip(cfg["control"].keys(), control_name.split("_"))
            }
    cfg["control_name"] = "_".join([str(cfg["control"][k]) for k in cfg["control"]])
    return cfg


def make_model_tag(cfg: dict, seed: int | None = None) -> str:
    """The universal artifact join key: ``{seed}_{data}_{subset}_{model}[_{rate}]``.

    Built identically to every reference entry script
    (reference src/train_gan.py:62-63, src/generate.py:29-30).
    """
    seed = cfg["init_seed"] if seed is None else seed
    parts = [str(seed), cfg["data_name"], cfg["subset"], cfg["model_name"],
             cfg.get("control_name", "")]
    return "_".join(p for p in parts if p)


# Per-dataset shape / sampling protocol (reference src/utils.py:107-126).
_DATA_SHAPES = {
    "MNIST": ((32, 32, 1), 1000),
    "FashionMNIST": ((32, 32, 1), 1000),
    "EMNIST": ((32, 32, 1), 1000),
    "Omniglot": ((32, 32, 1), 20),
    "SVHN": ((32, 32, 3), 1000),
    "CIFAR10": ((32, 32, 3), 1000),
    "CIFAR100": ((32, 32, 3), 1000),
    "COIL100": ((32, 32, 3), 100),
    "ImageNet32": ((32, 32, 3), 20),
    "Synthetic": ((32, 32, 3), 8),
    "SyntheticGray": ((32, 32, 1), 8),
    "CelebA-HQ": ((128, 128, 3), 20),
    "ImageNet": ((128, 128, 3), 20),
}


def process_control(cfg: dict) -> dict:
    """Derive per-model / per-dataset hyperparameters.

    Pure-function port of reference src/utils.py:104-192. Shapes are NHWC
    (TPU-native layout) rather than the reference's NCHW; ``data_shape`` is
    ``(H, W, C)``.
    """
    cfg = copy.deepcopy(cfg)
    if "controller_rate" in cfg.get("control", {}):
        cfg["controller_rate"] = float(cfg["control"]["controller_rate"])
    data_name = cfg["data_name"]
    m = re.fullmatch(r"(Synthetic|SyntheticGray)(\d+)", data_name)
    if m:
        # K-mode Synthetic variant (data/datasets.py): per-mode sampling
        # protocol mirrors the reference's regimes at that mode count —
        # Omniglot (1,623 modes) generates 20/mode, COIL100 (100 modes)
        # 100/mode (reference src/utils.py:107-126)
        k = int(m.group(2))
        shape = _DATA_SHAPES[m.group(1)][0]
        per_mode = 20 if k >= 1000 else (100 if k > 10 else 8)
    elif data_name not in _DATA_SHAPES:
        raise ValueError(f"Not valid dataset: {data_name}")
    else:
        shape, per_mode = _DATA_SHAPES[data_name]
    cfg["data_shape"] = list(shape)
    cfg["generate_per_mode"] = per_mode
    res = shape[0]

    if not cfg.get("derive_model_params", True):
        # caller supplied explicit model hyperparameter dicts (tests use tiny
        # models); keep them instead of re-deriving the reference sizes
        cfg.setdefault("classifier", {"hidden_size": [8, 16, 32, 64]})
        if "batch_size" not in cfg or cfg.get("derive_batch_size", True):
            cfg["batch_size"] = (
                {"train": 128, "test": 512} if res == 32
                else {"train": 32, "test": 128}
            )
        return cfg

    if cfg.get("ae_name") == "vqvae":
        cfg["vqvae"] = {
            "hidden_size": [128, 128] if res == 32 else [128, 128, 128, 128],
            "num_res_block": 2,
            "embedding_size": 64,
            "num_embedding": 512,
            "vq_commit": 0.25,
        }
    name = cfg["model_name"]
    if name in ("cpixelcnn", "mcpixelcnn"):
        cfg["pixelcnn"] = {"num_layer": 15, "hidden_size": 128, "num_embedding": 512}
    elif name in ("cvae", "mcvae"):
        cfg["vae"] = {
            "hidden_size": [64, 128, 256] if res == 32 else [64, 128, 256, 512, 512],
            "latent_size": 128 if res == 32 else 256,
            "num_res_block": 2,
            "embedding_size": 32,
        }
    elif name in ("cgan", "mcgan"):
        if res == 32:
            if cfg["data_name"] in ("CIFAR10",):
                g_hidden, d_hidden = [256] * 4, [128] * 4
            else:
                g_hidden, d_hidden = [512, 256, 128, 64], [64, 128, 256, 512]
        else:
            g_hidden = [1024, 512, 256, 128, 64]
            d_hidden = [64, 128, 256, 512, 1024]
        cfg["gan"] = {
            "latent_size": 128,
            "generator_hidden_size": g_hidden,
            "discriminator_hidden_size": d_hidden,
            "embedding_size": 32,
        }
    elif name in ("cglow", "mcglow"):
        cfg["glow"] = {
            "hidden_size": 512,
            "K": 16,
            "L": 3 if res == 32 else 5,
            "affine": True,
            "conv_lu": True,
            # scan one flow body over K-stacked params: ~K-fold smaller
            # traces/compiles, identical semantics
            "scan_flows": True,
        }
    cfg["classifier"] = {"hidden_size": [8, 16, 32, 64]}
    if "batch_size" not in cfg or cfg.get("derive_batch_size", True):
        cfg["batch_size"] = (
            {"train": 128, "test": 512} if res == 32 else {"train": 32, "test": 128}
        )
    return cfg
