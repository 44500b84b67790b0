"""generate / transit / create entry logic (reference src/generate.py,
src/transit.py, src/create.py runExperiment shells)."""

from __future__ import annotations

import jax

from ..config import make_model_tag, process_control
from ..data import fetch_dataset, process_dataset
from ..train.loop import apply_family_overrides
from ..workflows import create_workflow, generate, load_sampler, transit_workflow
from ._common import parse_cfg

_WORKFLOWS = {
    "generate": generate,
    "transit": transit_workflow,
    "create": create_workflow,
}


def main(workflow: str, argv=None, **defaults):
    cfg = parse_cfg(argv, **defaults)
    cfg = process_control(cfg)
    cfg = apply_family_overrides(cfg)
    for i in range(cfg.get("num_experiments", 1)):
        seed = cfg["init_seed"] + i
        tag = make_model_tag(cfg, seed)
        print(f"Experiment: {tag}")
        dataset = fetch_dataset(cfg["data_name"], cfg["subset"],
                                cfg.get("data_dir", "./data"))
        cfg_i = process_dataset(dataset["train"], cfg)
        cfg_i["model_tag"] = tag
        sampler = load_sampler(cfg_i, tag)
        _WORKFLOWS[workflow](sampler, tag, rng=jax.random.PRNGKey(seed))


if __name__ == "__main__":
    import sys

    main(sys.argv[1], sys.argv[2:])
