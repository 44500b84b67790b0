#!/usr/bin/env python
"""Generate golden MC-codebook fixtures from the REFERENCE implementation.

Runs the reference's own ``MultimodalController.make_codebook``
(/root/reference/src/modules/modules.py:58-69) under ``torch.manual_seed`` for
several seeds and layer shapes, and saves the resulting codebooks to
``tests/fixtures/torch_codebooks.npz``. The parity test
(tests/test_torch_parity.py) asserts our ``make_codebook(torch_compat=True)``
reproduces these bit-exactly.

Determinism note: the reference dedupes through a Python ``set`` of float
tuples; tuple hashing is not randomized (PYTHONHASHSEED only affects str),
so set iteration order — and therefore the final row order — is reproducible
across processes for identical insert sequences.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/src"

# (num_mode, input_size, controller_rate) cells covering real model layers
CELLS = [
    (10, 128, 0.5),   # MCGAN D hidden
    (10, 256, 0.5),   # MCGAN G hidden
    (100, 128, 0.5),  # CIFAR100-sized mode count
    (10, 64, 0.5),    # small hidden (tests)
    (10, 16, 0.3),    # non-default rate, small features (collision-prone)
]
SEEDS = [0, 1, 2]


def main():
    sys.path.insert(0, REF)
    os.chdir(REF)  # reference config.py loads ./config.yml
    from modules import MultimodalController

    out = {}
    for seed in SEEDS:
        for num_mode, input_size, rate in CELLS:
            torch.manual_seed(seed)
            mc = MultimodalController(input_size, num_mode, rate)
            key = f"s{seed}_m{num_mode}_f{input_size}_r{rate}"
            out[key] = mc.codebook.numpy().astype(np.float32)
    path = os.path.join(REPO, "tests", "fixtures", "torch_codebooks.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {len(out)} codebooks to {path}")
    for k, v in list(out.items())[:3]:
        print(k, v.shape, "row0[:8]:", v[0, :8])


if __name__ == "__main__":
    main()
