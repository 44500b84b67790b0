#!/usr/bin/env python
"""Scoring-pipeline script generator (reference src/make_test.py): emits shell
scripts that run the IS/FID scoring of generated dumps and the DBI scoring of
created dumps for the cartesian product of datasets x variants x seeds."""

from __future__ import annotations

import argparse
import itertools


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--data", nargs="+", default=["CIFAR10", "COIL100", "Omniglot"])
    p.add_argument("--init_seeds", nargs="+", type=int, default=[0])
    p.add_argument("--round", type=int, default=1)
    p.add_argument("--extra", default="",
                   help="flags appended verbatim to every emitted command")
    p.add_argument("--out_dir", default=".",
                   help="directory for the emitted script (default: cwd)")
    p.add_argument("--official_tf", action="store_true",
                   help="reference split (reference make_test.py:12-102): "
                        "score CIFAR10 dumps with the official frozen-"
                        "TF-graph CLIs (inception_score_tf.py / fid_tf.py "
                        "npy <tag>; needs the 2015 GraphDef on disk) and "
                        "everything else with test_generated")
    args = p.parse_args()
    variants = {
        "vae": ["cvae", "mcvae"], "gan": ["cgan", "mcgan"],
        "glow": ["cglow", "mcglow"], "pixelcnn": ["cpixelcnn", "mcpixelcnn"],
    }[args.model]
    cmds = []
    for data, variant, seed in itertools.product(args.data, variants, args.init_seeds):
        control = "0.5" if variant.startswith("mc") else "None"
        base = (f"--data_name {data} --model_name {variant} "
                f"--control_name {control} --init_seed {seed}")
        if args.official_tf and data == "CIFAR10":
            # the npy dump name must match what generate.py writes — derive
            # it through the one tag builder (config.make_model_tag), not a
            # re-hardcoded copy of the scheme
            from mcgm_tpu.config import apply_control_name, load_config, \
                make_model_tag

            tag_cfg = apply_control_name(
                dict(load_config(), data_name=data, model_name=variant),
                control)
            tag = f"generated_{make_model_tag(tag_cfg, seed)}"
            cmds.append(f"python inception_score_tf.py npy {tag}")
            cmds.append(f"python fid_tf.py npy {tag}")
        else:
            cmds.append(f"python -m mcgm_tpu.cli.test_generated generated {base}")
        cmds.append(f"python -m mcgm_tpu.cli.test_generated created {base}")
    if args.extra:
        cmds = [f"{c} {args.extra}" for c in cmds]
    import os

    out = os.path.join(args.out_dir, f"test_generated_{args.model}.sh")
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
