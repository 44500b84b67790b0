"""Transit workflow (reference src/transit.py:49-82).

Fixed per-mode noise; for 11 alphas in linspace(0, 1, save_per_mode + 1) the
codebooks/embeddings are interpolated toward root mode 0 (pure transform —
``models.manipulate.transit``) and the same noise is re-decoded; rows stack
into an interpolation grid per 10/50/100-mode panel.
"""

from __future__ import annotations

import numpy as np
import jax

from ..io.images import save_image_grid
from ..models.manipulate import transit
from ..utils import vis_path
from .sampling import Sampler


def transit_workflow(sampler: Sampler, tag: str, rng=None, root: int = 0):
    cfg = sampler.cfg
    rng = jax.random.PRNGKey(int(tag.split("_")[0])) if rng is None else rng
    alphas = np.linspace(0, 1, cfg["save_per_mode"] + 1)
    pristine = sampler.variables
    results = {}
    for max_modes in (10, 50, 100):
        if max_modes > cfg["classes_size"]:
            continue
        save_num_mode = min(max_modes, cfg["classes_size"])
        C = np.arange(save_num_mode)
        rng, sub = jax.random.split(rng)
        z = sampler.sample_z(save_num_mode, sub)
        rows = []
        for alpha in alphas:
            s = sampler.with_variables(transit(pristine, root, float(alpha)))
            rows.append(s.sample_with_z(C, z))
        grid = np.concatenate(rows)
        save_image_grid(
            grid,
            vis_path(cfg, f"transited_{tag}_{save_num_mode}.{cfg['save_format']}"),
            nrow=save_num_mode)
        results[save_num_mode] = grid
    return results
