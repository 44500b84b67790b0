"""Model summary CLI (reference src/summary.py): build each model at the
config sizes and write per-parameter tables + totals to output/summary.md."""

from __future__ import annotations

import jax

from ..config import process_control
from ..models import build_model
from ..report.summary import summarize_model
from ..train.loop import RNG_STREAMS, FAMILY, apply_family_overrides
from ..train.state import cpu_init
from ._common import parse_cfg
import jax.numpy as jnp


def summarize_cfg_model(cfg: dict, model_name: str) -> str:
    cfg = dict(cfg)
    cfg["model_name"] = model_name
    cfg = apply_family_overrides(process_control(cfg))
    cfg.setdefault("classes_size", 10)
    model = build_model(cfg)
    fam = FAMILY[model_name]
    if fam == "pixelcnn":
        grid = cfg["data_shape"][0] // 4
        batch = {"img": jnp.zeros((2, grid, grid), jnp.int32),
                 "label": jnp.zeros((2,), jnp.int32)}
    else:
        batch = {"img": jnp.zeros((2, *cfg["data_shape"])),
                 "label": jnp.zeros((2,), jnp.int32)}
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "z": rng,
            **{s: rng for s in RNG_STREAMS.get(fam, ())}}
    variables = cpu_init(model, rngs, batch, train=True)
    return summarize_model(model, variables, model_name, cfg["output_dir"])


def main(argv=None, **defaults):
    cfg = parse_cfg(argv, **defaults)
    names = ([cfg["model_name"]] if cfg.get("model_name") else
             ["cvae", "mcvae", "vqvae", "classifier", "cgan", "mcgan",
              "cglow", "mcglow", "cpixelcnn", "mcpixelcnn"])
    for name in names:
        text = summarize_cfg_model(cfg, name)
        print(text.splitlines()[-1], "-", name)


if __name__ == "__main__":
    main()
