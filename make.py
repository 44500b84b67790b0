#!/usr/bin/env python
"""Launch-script generator (reference src/make.py): emits
``train_{model}.sh`` / ``test_{model}.sh`` with the cartesian product of
datasets x {c,mc} variants x seeds. On TPU there is no CUDA_VISIBLE_DEVICES
round-robin — each job owns the chip (or a mesh slice via ``world_size``);
jobs are grouped with ``wait`` every ``--round`` entries like the reference.
"""

from __future__ import annotations

import argparse
import itertools


def make_commands(run: str, model: str, data_names, init_seeds, num_experiments,
                  world_size: int = 1, seed_parallel: bool = False):
    script = {"train": f"train_{model}.py", "test": f"mcgm_tpu.cli.test_model"}
    variants = {
        "vae": ["cvae", "mcvae"], "gan": ["cgan", "mcgan"],
        "glow": ["cglow", "mcglow"], "pixelcnn": ["cpixelcnn", "mcpixelcnn"],
        "vqvae": ["vqvae"], "classifier": ["classifier"],
    }[model]
    if seed_parallel and run == "train":
        # collapse the per-seed job fan-out into ONE vmapped run per cell
        # (train/seed_parallel.py): the seeds become num_experiments of a
        # single command. Requires a contiguous ascending seed range (the
        # runner trains init_seed..init_seed+S-1); test jobs stay per-seed
        # (scoring a trained checkpoint is per-tag either way).
        seeds = sorted(init_seeds)
        if seeds != list(range(seeds[0], seeds[0] + len(seeds))):
            raise SystemExit(f"--seed_parallel needs a contiguous seed "
                             f"range, got {init_seeds}")
        if len(seeds) < 2:
            raise SystemExit("--seed_parallel needs >= 2 seeds")
        if model == "gan":
            raise SystemExit("--seed_parallel excludes the gan family "
                             "(its step already runs at per-op MXU "
                             "ceilings — DESIGN.md); emit per-seed jobs")
        init_seeds, num_experiments = [seeds[0]], len(seeds)
    cmds = []
    for data, variant, seed in itertools.product(data_names, variants, init_seeds):
        control = "0.5" if variant.startswith("mc") else "None"
        entry = (f"python train_{model}.py" if run == "train"
                 else "python -m mcgm_tpu.cli.test_model")
        cmds.append(
            f"{entry} --data_name {data} --model_name {variant} "
            f"--control_name {control} --init_seed {seed} "
            f"--num_experiments {num_experiments} --world_size {world_size}"
            + (" --seed_parallel True"
               if seed_parallel and run == "train" else "")
        )
    return cmds


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="train", choices=["train", "test"])
    p.add_argument("--model", required=True)
    p.add_argument("--data", nargs="+", default=["CIFAR10", "COIL100", "Omniglot"])
    p.add_argument("--init_seeds", nargs="+", type=int, default=[0])
    p.add_argument("--num_experiments", type=int, default=1)
    p.add_argument("--world_size", type=int, default=1)
    p.add_argument("--round", type=int, default=1)
    p.add_argument("--seed_parallel", action="store_true",
                   help="collapse the per-seed train jobs of each cell into "
                        "one vmapped seed-parallel run (contiguous "
                        "--init_seeds become --num_experiments of a single "
                        "command; test jobs stay per-seed)")
    p.add_argument("--extra", default="",
                   help="flags appended verbatim to every emitted command "
                        "(e.g. --extra '--config my.yml')")
    p.add_argument("--out_dir", default=".",
                   help="directory for the emitted script (default: cwd, "
                        "like the reference)")
    args = p.parse_args()
    cmds = make_commands(args.run, args.model, args.data, args.init_seeds,
                         args.num_experiments, args.world_size,
                         seed_parallel=args.seed_parallel)
    if args.extra:
        cmds = [f"{c} {args.extra}" for c in cmds]
    import os

    out = os.path.join(args.out_dir, f"{args.run}_{args.model}.sh")
    with open(out, "w") as f:
        f.write("#!/bin/bash\n")
        for i, c in enumerate(cmds):
            f.write(c + " &\n")
            if (i + 1) % args.round == 0:
                f.write("wait\n")
        f.write("wait\n")
    print(f"wrote {out} ({len(cmds)} jobs)")


if __name__ == "__main__":
    main()
