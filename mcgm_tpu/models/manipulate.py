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


_TORCH_TOP_RANK = {"encoder": 0, "decoder": 1, "generator": 0,
                   "discriminator": 1}


def _nat(name: str) -> int:
    import re

    m = re.search(r"_(\d+)$", str(name))
    return int(m.group(1)) if m else -1


def _ref_order_key(family: str, parts: tuple):
    """Sort key reproducing the REFERENCE's named_modules() registration
    order for create-matched modules (torch registers submodules in
    execution order, and our flax call order mirrors the same architecture —
    verified against live reference model dumps; see
    tests/test_torch_parity.py create tests)."""
    parts = [str(p) for p in parts]
    if family == "vae":
        top = _TORCH_TOP_RANK.get(parts[0], 9)
        if len(parts) > 1 and parts[1].startswith("MCResBlock"):
            return (top, 1, _nat(parts[1]), _nat(parts[2]))
        i = _nat(parts[1]) if len(parts) > 1 else 0
        if top == 1:  # decoder: MC_0, MC_1, res blocks, MC_2+ (mcvae.py:70-95)
            return (top, 0 if i < 2 else 2, i, 0)
        return (top, 0, i, 0)
    if family == "gan":
        top = _TORCH_TOP_RANK.get(parts[0], 9)
        name = parts[1] if len(parts) > 1 else ""
        if name.startswith("_MC") or name.startswith("_C"):
            blk = -1 if "First" in name else _nat(name)
            mc = 0 if parts[2] == "mc_1" else 1
            return (top, 0, blk, mc)
        return (top, 1, 0, 0)  # trailing head controller / embedding
    if family == "pixelcnn":
        if parts[0] == "head":
            return (1, 0, 0)
        sub = {"gate_v": 0, "gate_h": 1, "horiz_resid_mc": 2,
               "class_cond_embedding": 0}.get(parts[1], 0)
        return (0, _nat(parts[0]), sub)
    if family == "glow":
        bi = _nat(parts[0])
        fl = _nat(parts[1]) if parts[1].startswith("flow_") else -1
        mc = max(_nat(parts[-2]), 0)
        return (bi, fl, mc)
    return tuple(parts)


def _torch_create_codebook(classes_size: int, features: int) -> np.ndarray:
    """Reference create_codebook under the torch global stream
    (models/utils.py:34-44): Bernoulli(0.5) batches of shape
    [classes_size, features], deduped through a Python set of float tuples,
    first classes_size rows in set-iteration order."""
    import torch

    d = torch.distributions.bernoulli.Bernoulli(probs=0.5)
    out: set = set()
    while len(out) < classes_size:
        batch = d.sample((classes_size, features))
        out.update(tuple(c) for c in batch.tolist())
    return np.asarray(list(out)[:classes_size], np.float32)


def _torch_create_mix(classes_size: int, old_modes: int) -> np.ndarray:
    """Reference create_embedding's Dirichlet(1) convex weights
    (models/utils.py:24-31) drawn from the torch global stream."""
    import torch

    conc = torch.ones(old_modes)
    m = torch.distributions.dirichlet.Dirichlet(conc)
    return m.sample((classes_size,)).numpy().astype(np.float32)


def create_torch_compat(variables, classes_size: int, seed: int,
                        model_name: str):
    """Bit-exact replica of the reference ``create`` stream.

    The reference seeds torch once (create.py:40) and then draws fresh
    codebooks / Dirichlet mixes while iterating ``named_modules()``
    (models/utils.py:47-88); reproducing the *created* modes of a migrated
    experiment therefore requires drawing in that exact module order, which
    :func:`_ref_order_key` encodes per family. Notes mirroring reference
    quirks: the cgan discriminator embedding consumes a Dirichlet draw but
    the assignment is dead (torch spectral norm recomputes ``weight`` from
    ``weight_orig`` on the next forward), so the draw is consumed and the
    kernel left unchanged.
    """
    import torch

    family = next(f for f in ("vae", "gan", "pixelcnn", "glow")
                  if f in model_name)
    if family == "glow":
        # the flow-major draw-order logic below assumes the scan_chunk=1
        # leaf layout ([K, num_mode, C] per MC position); a chunk=c tree
        # interleaves flows across flow_j leaves, so repack, apply, and
        # repack back — otherwise draws land on the wrong flows silently
        from .glow import detect_glow_scan_chunk, rechunk_glow_flows

        c = detect_glow_scan_chunk(variables)
        if c > 1:
            flat = rechunk_glow_flows(variables, to_chunk=1, from_chunk=c)
            out = create_torch_compat(flat, classes_size, seed, model_name)
            return rechunk_glow_flows(out, to_chunk=c, from_chunk=1)
    torch.manual_seed(seed)
    matched = []  # (kind, collection-relative parts, full path)
    for path, leaf in jax.tree_util.tree_leaves_with_path(variables):
        parts = tuple(getattr(p, "key", p) for p in path)
        if _is_codebook(path):
            matched.append(("codebook", parts[1:], parts, leaf))
        elif _embedding_axis(path) is not None:
            matched.append(("embedding", parts[1:], parts, leaf))
    matched.sort(key=lambda m: _ref_order_key(family, m[1]))
    replacements = {}
    for kind, rel, parts, leaf in matched:
        if kind == "codebook":
            if leaf.ndim == 3:  # scanned glow: [K, num_mode, C], 2 MCs/flow
                continue  # handled pairwise below
            replacements[parts] = jnp.asarray(
                _torch_create_codebook(classes_size, leaf.shape[-1]))
        else:
            axis = _embedding_axis([jax.tree_util.DictKey(p) for p in parts])
            mix = _torch_create_mix(classes_size, leaf.shape[axis])
            if family == "gan" and rel[0] == "discriminator":
                replacements[parts] = leaf  # dead assignment (SN recompute)
            else:
                replacements[parts] = _mix_rows(leaf, mix, axis)
    # scanned glow stacked leaves: reference order is flow-major
    # (flow k: MC_0 then MC_1), our leaves are stacked per MC position
    stacked = [(rel, parts, leaf) for kind, rel, parts, leaf in matched
               if kind == "codebook" and leaf.ndim == 3]
    if stacked:
        by_block: dict = {}
        for rel, parts, leaf in stacked:
            by_block.setdefault(str(rel[0]), []).append((rel, parts, leaf))
        for block in sorted(by_block, key=_nat):
            mcs = sorted(by_block[block], key=lambda m: _nat(m[0][-2]))
            K = mcs[0][2].shape[0]
            draws = {parts: [] for _, parts, _ in mcs}
            for _ in range(K):
                for _, parts, leaf in mcs:
                    draws[parts].append(_torch_create_codebook(
                        classes_size, leaf.shape[-1]))
            for _, parts, _ in mcs:
                replacements[parts] = jnp.stack(
                    [jnp.asarray(d) for d in draws[parts]])

    def transform(path, leaf):
        parts = tuple(getattr(p, "key", p) for p in path)
        return replacements.get(parts, leaf)

    return jax.tree_util.tree_map_with_path(transform, variables)


def create(variables, classes_size: int, rng_seed: int = 0,
           torch_compat: bool = False, model_name: str = ""):
    """Re-randomize mode identities (reference create — models/utils.py:47-88)."""
    if torch_compat:
        return create_torch_compat(variables, classes_size, rng_seed,
                                   model_name)
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
