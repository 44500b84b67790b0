"""Shared CLI plumbing: argparse mirrored from config keys + --control_name.

Preserves the reference's flag surface (reference train_gan.py:18-28 builds
argparse from cfg keys): ``--data_name``, ``--model_name``, ``--control_name``,
``--init_seed``, ``--num_experiments``, ``--resume_mode``, etc. Dict-valued
keys accept YAML literals (e.g. ``--batch_size '{train: 64, test: 256}'``).
"""

from __future__ import annotations

import argparse

import yaml

from ..config import apply_control_name, load_config


def parse_cfg(argv=None, **defaults) -> dict:
    cfg = load_config()
    cfg.update(defaults)
    parser = argparse.ArgumentParser(description="cfg")
    for k, v in cfg.items():
        if isinstance(v, bool):
            parser.add_argument(f"--{k}", default=None,
                                type=lambda s: yaml.safe_load(s))
        elif isinstance(v, (dict, list)):
            parser.add_argument(f"--{k}", default=None,
                                type=lambda s: yaml.safe_load(s))
        else:
            parser.add_argument(f"--{k}", default=None, type=type(v))
    parser.add_argument("--control_name", default=None, type=str)
    args = vars(parser.parse_args(argv))
    control_name = args.pop("control_name")
    for k, v in args.items():
        if v is not None:
            cfg[k] = v
    cfg = apply_control_name(cfg, control_name)
    return cfg
