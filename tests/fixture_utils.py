"""Shared deterministic-weight helpers for golden fixtures.

Used by both the fixture generators in ``tools/`` and the tests that verify
against the committed fixtures — the weights are a pure function of the
seed + the model's parameter tree, so the ~24M-parameter InceptionV3
weights never need to be committed, only the tiny input/output pins.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def randomize_variables(variables, seed: int = 0, scale: float = 0.1):
    """Replace every leaf with seeded noise; BN 'var' leaves stay positive.

    Leaves are filled in sorted-path order so the result is independent of
    dict insertion order.
    """
    rng = np.random.default_rng(seed)
    paths_leaves = jax.tree_util.tree_flatten_with_path(variables)[0]
    keyed = sorted(
        ((jax.tree_util.keystr(path), path, leaf)
         for path, leaf in paths_leaves),
        key=lambda t: t[0],
    )
    new_leaves = {}
    for keystr, path, leaf in keyed:
        shape = np.shape(leaf)
        val = rng.standard_normal(shape, np.float32)
        if keystr.endswith("['kernel']"):
            # He-style fan-in scaling keeps activations O(1) through deep
            # stacks — a fixture with exploding activations is chaotically
            # sensitive to rounding and useless as a pin
            fan_in = int(np.prod(shape[:-1])) or 1
            val = val * np.sqrt(2.0 / fan_in)
        elif keystr.endswith("['var']"):
            val = np.abs(val) * scale + 0.9
        elif keystr.endswith("['scale']"):
            val = 1.0 + val * scale
        else:  # bias / mean
            val = val * scale
        new_leaves[keystr] = val.astype(np.float32)

    def rebuild(path, leaf):
        return jnp.asarray(new_leaves[jax.tree_util.keystr(path)])

    return jax.tree_util.tree_map_with_path(rebuild, variables)


def make_random_inception(seed: int = 0, input_hw: int = 75):
    """(model, variables, input) for the golden-activation pin.

    75x75 inputs keep the forward cheap while exercising every stage of the
    trunk (spatial trace: 75->37->35->35->17->17->15->7->3->1).
    """
    from mcgm_tpu.evals.inception import InceptionV3

    model = InceptionV3()
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, input_hw, input_hw, 3))))
    variables = randomize_variables(shapes, seed=seed)
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, input_hw, input_hw, 3)),
                    jnp.float32)
    return model, variables, x
