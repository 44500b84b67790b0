"""Re-evaluate a trained model from its ``_best`` checkpoint.

Equivalent of reference test_{vae,vqvae,glow,pixelcnn,classifier}.py: reload
``_best``, run the trainer's test pass on the TRAIN loader, save
``{cfg, epoch, logger}`` to ``output/result/{tag}.pkl``
(reference test_vae.py:40-57).
"""

from __future__ import annotations

import datetime

from ..config import make_model_tag, process_control
from ..io.checkpoint import load_checkpoint
from ..report.logger import Logger
from ..train.loop import Experiment, apply_family_overrides
from ..utils import result_path, save
from ._common import parse_cfg


def evaluate_best(cfg: dict, seed: int) -> Logger:
    exp = Experiment(cfg, seed=seed)
    exp.setup()
    ckpt = load_checkpoint(exp.cfg, exp.tag, "best")
    if ckpt is None:
        raise FileNotFoundError(f"no best checkpoint for {exp.tag}")
    exp._load_model_variables(ckpt["model_dict"])
    stamp = datetime.datetime.now().strftime("%b%d_%H-%M-%S")
    exp.logger = Logger(f"{exp.cfg['output_dir']}/runs/test_{exp.tag}_{stamp}")
    exp.logger.safe(True)
    exp.test_epoch(ckpt["epoch"] - 1)
    exp.logger.safe(False)
    payload = {"cfg": exp.cfg, "epoch": ckpt["epoch"], "logger": exp.logger}
    save(payload, result_path(exp.cfg, exp.tag, "pkl"))
    return exp.logger


def main(argv=None, **defaults):
    cfg = parse_cfg(argv, **defaults)
    for i in range(cfg.get("num_experiments", 1)):
        seed = cfg["init_seed"] + i
        print(f"Experiment: {make_model_tag(apply_family_overrides(process_control(cfg)), seed)}")
        evaluate_best(cfg, seed)


if __name__ == "__main__":
    main()
