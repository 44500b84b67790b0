#!/usr/bin/env python
"""Import a reference (PyTorch) checkpoint into this framework's format.

Usage:
    python tools/import_torch_checkpoint.py REF_CKPT.pt \
        --model_name mcgan --data_name CIFAR10 --control_name 0.5 \
        [--out output/model/0_CIFAR10_label_mcgan_0.5_imported.pkl]

Reads the reference checkpoint (torch pickle with 'model_dict' as saved by
reference train_*.py:83-92, or a bare state_dict), converts it through
``mcgm_tpu.io.torch_import.convert``, and writes a checkpoint loadable by
this framework's test/generate/transit/create CLIs. Supported model names:
see ``torch_import.CONVERTERS``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--model_name", required=True)
    ap.add_argument("--data_name", default="CIFAR10")
    ap.add_argument("--control_name", default="0.5")
    ap.add_argument("--classes_size", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import torch

    from mcgm_tpu.config import (apply_control_name, load_config,
                                 make_model_tag, process_control)
    from mcgm_tpu.io.torch_import import convert
    from mcgm_tpu.utils import save

    blob = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = blob.get("model_dict", blob) if isinstance(blob, dict) else blob
    epoch = blob.get("epoch", 1) if isinstance(blob, dict) else 1

    cfg = apply_control_name(load_config(), args.control_name)
    cfg.update(model_name=args.model_name, data_name=args.data_name)
    cfg = process_control(cfg)
    cfg["classes_size"] = args.classes_size

    name = args.model_name
    if name in ("mcvae", "cvae"):
        dims = dict(hidden_size=cfg["vae"]["hidden_size"],
                    num_res_block=cfg["vae"]["num_res_block"],
                    res=cfg["data_shape"][0])
    elif name == "vqvae":
        dims = dict(hidden_size=cfg["vqvae"]["hidden_size"],
                    num_res_block=cfg["vqvae"]["num_res_block"])
    elif name == "classifier":
        dims = dict(hidden_size=cfg["classifier"]["hidden_size"],
                    res=cfg["data_shape"][0])
    elif name in ("mcgan", "cgan"):
        dims = dict(generator_hidden_size=cfg["gan"]["generator_hidden_size"],
                    discriminator_hidden_size=cfg["gan"]["discriminator_hidden_size"],
                    cifar_style=cfg["data_name"] in ("CIFAR10", "CIFAR100"),
                    res=cfg["data_shape"][0])
    elif name in ("mcpixelcnn", "cpixelcnn"):
        dims = dict(num_layer=cfg["pixelcnn"]["num_layer"])
    elif name in ("mcglow", "cglow"):
        dims = dict(K=cfg["glow"]["K"], L=cfg["glow"]["L"])
    else:
        raise SystemExit(f"no importer for {name!r} yet")

    variables = convert(name, sd, **dims)
    tag = make_model_tag(cfg, cfg["init_seed"])
    out = args.out or os.path.join(cfg["output_dir"], "model",
                                   f"{tag}_best.pkl")
    save({"cfg": cfg, "epoch": epoch, "model_dict": variables}, out)
    n = sum(getattr(l, "size", 0)
            for l in __import__("jax").tree_util.tree_leaves(variables))
    print(f"imported {name} ({n:,} values) -> {out}")


if __name__ == "__main__":
    main()
