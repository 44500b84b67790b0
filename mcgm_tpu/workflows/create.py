"""Create workflow (reference src/create.py:55-146): sample NEVER-TRAINED
modes by re-randomizing codebooks (Bernoulli 0.5) / Dirichlet-mixing class
embeddings, then class-sweep sampling.

- ``save_npy``: one creation at the trained ``classes_size``, dump
  ``created_{tag}.npy`` in [0, 255] (+ optional grid);
- vis path: for 10/50/100 created modes, rebuild the model with that mode
  count and re-create; the glow@CIFAR10 branch oversamples 1000/mode and
  keeps the first ``save_per_mode`` NaN-free images per mode
  (reference create.py:88-121).
"""

from __future__ import annotations

import numpy as np
import jax

from ..io.images import save_image_grid
from ..models import build_model
from ..models.manipulate import create
from ..utils import npy_path, save, vis_path
from .sampling import Sampler
from .generate import class_sweep


def _created_sampler(sampler: Sampler, classes_size: int, seed: int) -> Sampler:
    """Re-randomize modes, rebuilding the model if the mode count changes.

    ``cfg['torch_compat']`` draws the fresh codebooks/mixes from the torch
    stream in the reference's named_modules order, so a migrated experiment
    reproduces its created modes bit-for-bit (models/manipulate.py)."""
    new_vars = create(sampler.variables, classes_size, rng_seed=seed,
                      torch_compat=bool(sampler.cfg.get("torch_compat")),
                      model_name=sampler.cfg["model_name"])
    if classes_size != sampler.cfg["classes_size"]:
        cfg = dict(sampler.cfg)
        cfg["classes_size"] = classes_size
        model = build_model(cfg)
        s = Sampler(cfg, model, new_vars, sampler.ae_model, sampler.ae_variables)
        return s
    return sampler.with_variables(new_vars)


def create_workflow(sampler: Sampler, tag: str, rng=None):
    cfg = sampler.cfg
    seed = int(tag.split("_")[0])
    rng = jax.random.PRNGKey(seed ^ 0xC0DE) if rng is None else rng
    if cfg.get("save_npy"):
        s = _created_sampler(sampler, cfg["classes_size"], seed)
        C = class_sweep(cfg["classes_size"], cfg["generate_per_mode"])
        created = s.sample_chunked(C, rng)
        out = ((created + 1) / 2 * 255).transpose(0, 3, 1, 2)
        save(out, npy_path(cfg, f"created_{tag}"), mode="numpy")
        if cfg.get("save_img"):
            save_num_mode = min(100, cfg["classes_size"])
            rows = [created[i:i + save_num_mode]
                    for i in range(0, cfg["classes_size"] * cfg["save_per_mode"],
                                   cfg["classes_size"])]
            save_image_grid(np.concatenate(rows),
                            vis_path(cfg, f"created_{tag}.{cfg['save_format']}"),
                            nrow=save_num_mode)
        return out
    per_mode = cfg["save_per_mode"]
    glow_branch = "glow" in cfg["model_name"] and cfg["data_name"] in ("CIFAR10",)
    for save_num_mode in (10, 50, 100):
        s = _created_sampler(sampler, save_num_mode, seed + save_num_mode)
        rng, sub = jax.random.split(rng)
        if glow_branch:
            oversample = 1000
            C = np.tile(np.arange(save_num_mode), oversample)
            created = s.sample_chunked(C, sub)
            kept = []
            for j in range(save_num_mode):
                mode_imgs = created[j::save_num_mode]
                valid = ~np.isnan(mode_imgs).any(axis=(1, 2, 3))
                good = mode_imgs[valid][:per_mode]
                if len(good) < per_mode:
                    bad = mode_imgs[~valid][: per_mode - len(good)]
                    good = np.concatenate([good, bad])
                kept.append(good)
            grid = np.stack(kept)  # [modes, per_mode, H, W, C]
            grid = grid.transpose(1, 0, 2, 3, 4).reshape(-1, *grid.shape[2:])
        else:
            C = np.tile(np.arange(save_num_mode), per_mode)
            grid = s.sample_chunked(C, sub)
        save_image_grid(
            grid, vis_path(cfg, f"created_{tag}_{save_num_mode}.{cfg['save_format']}"),
            nrow=save_num_mode)
    return None
