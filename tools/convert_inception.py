#!/usr/bin/env python
"""Convert torchvision inception_v3 weights to the flax format used by
``mcgm_tpu.evals.inception``.

Usage (on a machine with network access or a downloaded checkpoint):
    python tools/convert_inception.py [path/to/inception_v3_google.pth]
Writes ``output/inception/inception_v3.pkl``.
"""

from __future__ import annotations

import os
import pickle
import sys

import numpy as np


def load_state_dict(path: str | None):
    import torch

    if path:
        return torch.load(path, map_location="cpu")
    try:
        from torchvision.models import inception_v3

        model = inception_v3(weights="IMAGENET1K_V1", transform_input=False)
        return model.state_dict()
    except Exception:
        url = ("https://download.pytorch.org/models/"
               "inception_v3_google-0cc3c7bd.pth")
        return torch.hub.load_state_dict_from_url(url, map_location="cpu")


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from mcgm_tpu.evals.inception import InceptionV3, convert_torch_state_dict

    path = sys.argv[1] if len(sys.argv) > 1 else None
    sd = {k: np.asarray(v) for k, v in load_state_dict(path).items()}
    variables = convert_torch_state_dict(sd)

    # shape-check against a fresh init
    import jax
    import jax.numpy as jnp

    model = InceptionV3()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, variables)
    assert ref_shapes == got_shapes, "converted tree does not match the model"

    out = "output/inception/inception_v3.pkl"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "wb") as f:
        pickle.dump(jax.tree_util.tree_map(np.asarray, variables), f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
