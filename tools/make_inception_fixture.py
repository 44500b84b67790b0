"""Generate the InceptionV3 golden-activation pin.

Weights are deterministically regenerable from the seed
(tests/fixture_utils.randomize_variables), so only the forward outputs are
committed: tests/fixtures/inception_golden.npz. A change to the
architecture, the layer math, or the converter's layout assumptions will
break the pin — which is the point: a future torchvision weight conversion
is provably loading into an unchanged network.

Run from the repo root: python tools/make_inception_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

# the environment pins a TPU platform at the process level and the plugin
# ignores JAX_PLATFORMS; the pin must go through jax.config (as in
# tests/conftest.py) so the fixture bakes on the same platform the test
# suite runs on
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fixture_utils import make_random_inception


def main():
    model, variables, x = make_random_inception(seed=0)
    feats, logits = model.apply(variables, x)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "inception_golden.npz")
    np.savez_compressed(out, feats=np.asarray(feats, np.float32),
                        logits=np.asarray(logits, np.float32))
    print(f"wrote {out}: feats {feats.shape}, logits {logits.shape}, "
          f"|feats| mean {np.abs(feats).mean():.4f}")


if __name__ == "__main__":
    main()
