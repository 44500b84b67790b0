"""Unified training entry point; the six ``train_*.py`` shims at the repo
root pin the model family (reference has one script per family with an
identical skeleton — src/train_vae.py et al.)."""

from __future__ import annotations

from ..train.loop import run_experiments
from ._common import parse_cfg


def main(argv=None, **defaults):
    cfg = parse_cfg(argv, **defaults)
    run_experiments(cfg)


if __name__ == "__main__":
    main()
