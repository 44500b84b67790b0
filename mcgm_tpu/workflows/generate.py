"""Generate workflow (reference src/generate.py).

``save_npy`` path: class sweep ``tile(arange(classes_size),
generate_per_mode)`` in chunks of 1000, de-normalized to [0, 255], dumped to
``output/npy/generated_{tag}.npy`` (+ optional grid). Vis path: grids of
``save_per_mode`` rows for 10/50/100 modes.
"""

from __future__ import annotations

import numpy as np
import jax

from ..io.images import save_image_grid
from ..utils import npy_path, save, vis_path
from .sampling import Sampler


def class_sweep(classes_size: int, per_mode: int) -> np.ndarray:
    """torch ``arange(K).repeat(n)`` tiles (reference generate.py:60-61)."""
    return np.tile(np.arange(classes_size), per_mode)


def generate(sampler: Sampler, tag: str, rng=None) -> np.ndarray | None:
    cfg = sampler.cfg
    rng = jax.random.PRNGKey(int(tag.split("_")[0])) if rng is None else rng
    if cfg.get("save_npy"):
        C = class_sweep(cfg["classes_size"], cfg["generate_per_mode"])
        generated = sampler.sample_chunked(C, rng)
        # [0,255] float, NCHW in the dump for reference-format parity
        # (reference generate.py:72-73)
        out = ((generated + 1) / 2 * 255).transpose(0, 3, 1, 2)
        save(out, npy_path(cfg, f"generated_{tag}"), mode="numpy")
        if cfg.get("save_img"):
            save_num_mode = min(100, cfg["classes_size"])
            rows = [generated[i:i + save_num_mode]
                    for i in range(0, cfg["classes_size"] * cfg["save_per_mode"],
                                   cfg["classes_size"])]
            save_image_grid(np.concatenate(rows),
                            vis_path(cfg, f"generated_{tag}.{cfg['save_format']}"),
                            nrow=save_num_mode)
        return out
    for max_modes in (10, 50, 100):
        if max_modes > cfg["classes_size"]:
            continue
        save_num_mode = min(max_modes, cfg["classes_size"])
        C = np.tile(np.arange(save_num_mode), cfg["save_per_mode"])
        rng, sub = jax.random.split(rng)
        saved = sampler.sample_chunked(C, sub)
        save_image_grid(
            saved, vis_path(cfg, f"generated_{tag}_{save_num_mode}.{cfg['save_format']}"),
            nrow=save_num_mode)
    return None
