"""Mode creation and transition: pure pytree transforms.

Port of reference src/models/utils.py:24-152, redesigned functionally: where
the reference mutates modules in place by name reflection (re-registering
buffers / replacing nn.Parameters), these functions map a variables pytree to
a new pytree. ``transit`` takes the pristine variables each call instead of
caching ``*_orig`` buffers on modules.

Matched leaves:
- every MultimodalController codebook (collection ``codebook``);
- class-embedding weights: the bias-free ``embedding`` Dense of
  cvae/cgan ([num_mode, emb] kernel rows), the PixelCNN
  ``class_cond_embedding`` Embed table, and CGlow's prior ``embedding``
  ZeroConv kernel ([1,1,num_mode,out], mode axis 2).

Semantics:
- ``create``: fresh deduped Bernoulli(0.5) codebooks sized to
  ``classes_size`` (reference models/utils.py:34-44); embeddings become
  Dirichlet(1) convex combinations of the pretrained rows (24-31). The new
  mode count may differ from the trained one — callers rebuild the model with
  the new ``num_mode``.
- ``transit``: codebook rows get a crossover with the root row (first
  ``round((1-alpha)*K)`` mask entries replaced — 101-109); embeddings
  linearly interpolate toward the root row (91-98). The root row itself is
  unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.controller import make_codebook


def _is_codebook(path) -> bool:
    return path and getattr(path[-1], "key", None) == "codebook"


def _embedding_axis(path):
    """Return the mode axis for class-embedding leaves, or None."""
    keys = [getattr(p, "key", None) for p in path]
    if len(keys) >= 2 and keys[-2] == "class_cond_embedding" and keys[-1] == "embedding":
        return 0  # nn.Embed table [num_mode, feat]
    if "embedding" in keys and keys[-1] == "kernel":
        i = keys.index("embedding")
        rest = keys[i + 1:]
        if rest == ["kernel"]:
            return 0  # Dense kernel [num_mode, emb]
        if rest == ["conv", "kernel"]:
            return 2  # ZeroConv kernel [1, 1, num_mode, out]
    return None


def _mix_rows(weight, mix, axis):
    """Apply a [new_modes, old_modes] row-mixing matrix along ``axis``."""
    w = jnp.moveaxis(jnp.asarray(weight), axis, 0)
    mixed = jnp.tensordot(jnp.asarray(mix, w.dtype), w, axes=1)
    return jnp.moveaxis(mixed, 0, axis)


def create(variables, classes_size: int, rng_seed: int = 0):
    """Re-randomize mode identities (reference create — models/utils.py:47-88)."""
    counter = [0]

    def transform(path, leaf):
        if _is_codebook(path):
            counter[0] += 1
            if leaf.ndim == 3:  # scanned flows: [K, num_mode, C]
                base = counter[0] * 1000
                return jnp.stack([
                    make_codebook(rng_seed + base + i, classes_size,
                                  leaf.shape[-1], 0.5)
                    for i in range(leaf.shape[0])
                ])
            return make_codebook(rng_seed + counter[0], classes_size,
                                 leaf.shape[-1], 0.5)
        axis = _embedding_axis(path)
        if axis is not None:
            old_modes = leaf.shape[axis]
            rng = np.random.default_rng((rng_seed, counter[0], old_modes))
            counter[0] += 1
            mix = rng.dirichlet(np.ones(old_modes), size=classes_size)
            return _mix_rows(leaf, mix, axis)
        return leaf

    return jax.tree_util.tree_map_with_path(transform, variables)


def transit_codebook(codebook, root: int, alpha: float):
    """Crossover toward the root mask (reference models/utils.py:101-109).

    Accepts ``[num_mode, C]`` or scanned-stacked ``[K, num_mode, C]``.
    """
    cb = np.array(codebook)
    if cb.ndim == 3:
        return jnp.stack([transit_codebook(c, root, alpha) for c in cb])
    root_code = cb[root].copy()
    cross = int(round((1 - alpha) * cb.shape[1]))
    cb[:, :cross] = root_code[:cross]
    cb[root] = root_code
    return jnp.asarray(cb)


def transit_embedding(weight, root: int, alpha: float, axis: int):
    """Linear interpolation toward the root row (reference models/utils.py:91-98)."""
    w = np.moveaxis(np.array(weight), axis, 0)
    root_row = w[root].copy()
    w = alpha * w + (1 - alpha) * root_row
    w[root] = root_row
    return jnp.asarray(np.moveaxis(w, 0, axis))


def transit(variables, root: int, alpha: float):
    """Interpolate every mode toward ``root`` (reference transit — 112-152).

    Always call with the PRISTINE trained variables; repeated calls with
    different alphas are independent (the reference's ``*_orig`` caching is
    unnecessary in this pure form).
    """

    def transform(path, leaf):
        if _is_codebook(path):
            return transit_codebook(leaf, root, alpha)
        axis = _embedding_axis(path)
        if axis is not None:
            return transit_embedding(leaf, root, alpha, axis)
        return leaf

    return jax.tree_util.tree_map_with_path(transform, variables)
