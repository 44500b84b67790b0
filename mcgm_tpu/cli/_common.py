"""Shared CLI plumbing: argparse mirrored from config keys + --control_name.

Preserves the reference's flag surface (reference train_gan.py:18-28 builds
argparse from cfg keys): ``--data_name``, ``--model_name``, ``--control_name``,
``--init_seed``, ``--num_experiments``, ``--resume_mode``, etc. Dict-valued
keys accept YAML literals (e.g. ``--batch_size '{train: 64, test: 256}'``).

Two additions over the reference surface:

- ``--config PATH`` replaces the packaged ``config.yml`` as the base config
  (the reference's workflow is "edit src/config.yml in place" — reference
  src/config.py:4-6; a path flag gives the same customization without
  editing the installed package). Extra keys in the file become flags too.
- ``cfg['device']`` is live: ``cpu`` pins the JAX platform to host CPU
  before any backend use (the analog of the reference's
  ``cfg['device'] = 'cpu'`` CUDA/CPU switch, reference src/config.yml +
  tensor ``.to(cfg['device'])`` placement); ``tpu`` (default) leaves JAX's
  normal platform resolution alone.
"""

from __future__ import annotations

import argparse
import sys

import yaml

from ..config import apply_control_name, load_config


def _split_config_flag(argv):
    """Extract ``--config PATH`` / ``--config=PATH`` before argparse runs —
    the remaining flag surface is built FROM the file it names."""
    path, rest, i = None, [], 0
    while i < len(argv):
        a = argv[i]
        if a == "--config":
            if i + 1 >= len(argv):
                raise SystemExit("--config requires a path argument")
            path, i = argv[i + 1], i + 2
        elif a.startswith("--config="):
            path, i = a.split("=", 1)[1], i + 1
        else:
            rest.append(a)
            i += 1
    return path, rest


def configure_device(cfg: dict) -> None:
    """Honor ``cfg['device']``: 'cpu' forces the host-CPU JAX platform
    (effective when called before first backend use — parse_cfg runs at CLI
    startup, ahead of any compute); 'tpu' keeps default resolution.

    Also enables JAX's persistent compilation cache at
    ``cfg['compile_cache_dir']`` (empty string disables). The reference
    protocol launches every experiment as its own OS process (make.py's
    emitted scripts — 12 seeds x variants per cell), so without the disk
    cache each job pays the full XLA compile; with it, job N's compiles
    are near-free cache loads. The enable is fenced through
    mcgm_tpu.compile_cache: under the remote-compile axon backend the
    cache deadlocks the client (round-3 BENCH rc=124), so it stays off
    there unless MCGM_COMPILE_CACHE=1 forces it."""
    device = str(cfg.get("device", "tpu")).lower()
    import jax

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ..compile_cache import enable_compile_cache

    enable_compile_cache(str(cfg.get("compile_cache_dir", "")))


def parse_cfg(argv=None, **defaults) -> dict:
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    config_path, argv = _split_config_flag(argv)
    cfg = load_config(config_path)
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
    parser.add_argument("--config", default=None, type=str,
                        help="base config YAML (default: packaged config.yml)")
    args = vars(parser.parse_args(argv))
    args.pop("config", None)  # consumed by the pre-scan above
    control_name = args.pop("control_name")
    for k, v in args.items():
        if v is not None:
            cfg[k] = v
    cfg = apply_control_name(cfg, control_name)
    configure_device(cfg)
    return cfg
