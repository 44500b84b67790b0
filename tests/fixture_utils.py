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


def torch_inception_apply(variables, xt):
    """Full torch-functional replica of evals.inception.InceptionV3.

    Consumes the FLAX variable tree directly (kernels transposed back to
    torch OIHW on the fly) so torch and jax run from literally the same
    weights. Mirrors torchvision inception_v3(transform_input=False) eval
    forward (the reference's scorer, src/metrics/metrics.py:64-73, 114-126):
    conv → batch_norm(eps=1e-3) → relu per BasicConv2d, the Mixed_* block
    graph, adaptive-avg-pool features (the reference's FID trunk) and fc
    logits (its IS head). Input ``xt``: NCHW float tensor, already resized.
    Returns (features [N,2048], logits [N,1000]) torch tensors.
    """
    import torch
    import torch.nn.functional as F

    P, S = variables["params"], variables["batch_stats"]

    def t(a):
        return torch.tensor(np.asarray(a))

    def get(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    def basic(x, *path, stride=1, padding=0):
        p, s = get(P, path), get(S, path)
        w = t(p["conv"]["kernel"]).permute(3, 2, 0, 1)
        x = F.conv2d(x, w, stride=stride, padding=padding)
        x = F.batch_norm(x, t(s["bn"]["mean"]), t(s["bn"]["var"]),
                         t(p["bn"]["scale"]), t(p["bn"]["bias"]), eps=1e-3)
        return F.relu(x)

    def avg3(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1)

    def max3s2(x):
        return F.max_pool2d(x, 3, stride=2)

    def block_a(x, name):
        b1 = basic(x, name, "branch1x1")
        b5 = basic(basic(x, name, "branch5x5_1"), name, "branch5x5_2",
                   padding=2)
        bd = basic(basic(basic(x, name, "branch3x3dbl_1"),
                         name, "branch3x3dbl_2", padding=1),
                   name, "branch3x3dbl_3", padding=1)
        bp = basic(avg3(x), name, "branch_pool")
        return torch.cat([b1, b5, bd, bp], dim=1)

    def block_b(x, name):
        b3 = basic(x, name, "branch3x3", stride=2)
        bd = basic(basic(basic(x, name, "branch3x3dbl_1"),
                         name, "branch3x3dbl_2", padding=1),
                   name, "branch3x3dbl_3", stride=2)
        return torch.cat([b3, bd, max3s2(x)], dim=1)

    def block_c(x, name):
        b1 = basic(x, name, "branch1x1")
        b7 = basic(basic(basic(x, name, "branch7x7_1"),
                         name, "branch7x7_2", padding=(0, 3)),
                   name, "branch7x7_3", padding=(3, 0))
        bd = x
        for sub, pad in (("branch7x7dbl_1", 0), ("branch7x7dbl_2", (3, 0)),
                         ("branch7x7dbl_3", (0, 3)), ("branch7x7dbl_4", (3, 0)),
                         ("branch7x7dbl_5", (0, 3))):
            bd = basic(bd, name, sub, padding=pad)
        bp = basic(avg3(x), name, "branch_pool")
        return torch.cat([b1, b7, bd, bp], dim=1)

    def block_d(x, name):
        b3 = basic(basic(x, name, "branch3x3_1"), name, "branch3x3_2",
                   stride=2)
        b7 = basic(basic(basic(basic(x, name, "branch7x7x3_1"),
                               name, "branch7x7x3_2", padding=(0, 3)),
                         name, "branch7x7x3_3", padding=(3, 0)),
                   name, "branch7x7x3_4", stride=2)
        return torch.cat([b3, b7, max3s2(x)], dim=1)

    def block_e(x, name):
        b1 = basic(x, name, "branch1x1")
        b3 = basic(x, name, "branch3x3_1")
        b3 = torch.cat([basic(b3, name, "branch3x3_2a", padding=(0, 1)),
                        basic(b3, name, "branch3x3_2b", padding=(1, 0))],
                       dim=1)
        bd = basic(x, name, "branch3x3dbl_1")
        bd = basic(bd, name, "branch3x3dbl_2", padding=1)
        bd = torch.cat([basic(bd, name, "branch3x3dbl_3a", padding=(0, 1)),
                        basic(bd, name, "branch3x3dbl_3b", padding=(1, 0))],
                       dim=1)
        bp = basic(avg3(x), name, "branch_pool")
        return torch.cat([b1, b3, bd, bp], dim=1)

    with torch.no_grad():
        x = basic(xt, "Conv2d_1a_3x3", stride=2)
        x = basic(x, "Conv2d_2a_3x3")
        x = basic(x, "Conv2d_2b_3x3", padding=1)
        x = max3s2(x)
        x = basic(x, "Conv2d_3b_1x1")
        x = basic(x, "Conv2d_4a_3x3")
        x = max3s2(x)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d"):
            x = block_a(x, name)
        x = block_b(x, "Mixed_6a")
        for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
            x = block_c(x, name)
        x = block_d(x, "Mixed_7a")
        x = block_e(x, "Mixed_7b")
        x = block_e(x, "Mixed_7c")
        feats = x.mean(dim=(2, 3))
        logits = feats @ t(P["fc"]["kernel"]) + t(P["fc"]["bias"])
    return feats, logits


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
