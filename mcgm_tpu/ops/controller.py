"""MultimodalController: per-mode binary channel gating.

The paper's core mechanism (reference src/modules/modules.py:49-76): each class
("mode") owns a fixed binary mask over hidden channels, sampled once from
Bernoulli(controller_rate) with de-duplication so every mode's mask is unique.
The forward pass gates activations with the mask row selected by the one-hot
mode indicator; the mask is non-differentiable.

TPU-first design notes:
- codebooks are built host-side (the dedupe loop is data-dependent and belongs
  off the accelerator), stored as a flax variable collection ``codebook`` so
  they ride in checkpoints and can be swapped by the create/transit workflows
  as pure pytree transforms;
- gating is ``x * (indicator @ codebook)`` broadcast channels-last (NHWC), a
  single fused multiply XLA folds into the surrounding conv/matmul epilogue;
- the gate itself costs O(B*C) FLOPs; the fusion win comes from keeping it in
  the same HBM round-trip as the producing op.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def _seed_from_key(key) -> int:
    data = np.asarray(jax.random.key_data(key)).ravel()
    return int(data[-1]) & 0x7FFFFFFF


def make_codebook(
    seed: int | jax.Array,
    num_mode: int,
    features: int,
    controller_rate: float = 0.5,
    dtype=jnp.float32,
) -> jax.Array:
    """Sample ``num_mode`` unique binary masks of length ``features``.

    Port of the construction protocol at reference
    src/modules/modules.py:58-69: rate 1 short-circuits to all-ones; otherwise
    Bernoulli(rate) rows are drawn in batches of ``num_mode`` and de-duplicated
    until at least ``num_mode`` unique rows exist. Uniqueness is by
    first-occurrence order (the reference relies on a Python set; we use a
    deterministic insertion-ordered dedupe).
    """
    if controller_rate == 1:
        return jnp.ones((num_mode, features), dtype)
    if not isinstance(seed, (int, np.integer)):
        seed = _seed_from_key(seed)
    if features < 24 and 2 ** features < num_mode:
        raise ValueError(
            f"cannot draw {num_mode} unique masks from {{0,1}}^{features}"
        )
    rng = np.random.default_rng(seed)
    seen: dict[bytes, np.ndarray] = {}
    max_rounds = 10000
    for _ in range(max_rounds):
        batch = (rng.random((num_mode, features)) < controller_rate).astype(np.uint8)
        for row in batch:
            key = row.tobytes()
            if key not in seen:
                seen[key] = row
        if len(seen) >= num_mode:
            break
    else:
        raise RuntimeError("codebook dedupe did not converge")
    rows = list(seen.values())[:num_mode]
    return jnp.asarray(np.stack(rows).astype(np.float32), dtype)


def mc_gate(x: jax.Array, indicator: jax.Array, codebook: jax.Array) -> jax.Array:
    """Gate ``x`` by each sample's mode mask.

    ``indicator`` is one-hot ``[B, num_mode]`` (or already a soft row-mixing
    matrix — transit/create exploit this); ``codebook`` is
    ``[num_mode, C]``. Channels-last: the mask broadcasts over all middle
    (spatial) axes. The mask is a constant w.r.t. the loss
    (reference src/modules/modules.py:75 detaches it).
    """
    code = indicator @ codebook.astype(indicator.dtype)
    code = jax.lax.stop_gradient(code)
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (code.shape[-1],)
    return x * code.reshape(shape).astype(x.dtype)


class MultimodalController(nn.Module):
    """Flax layer holding the per-mode codebook as a ``codebook`` variable.

    The codebook is non-trainable state: it lives in its own variable
    collection so optimizers never touch it, checkpoints persist it (the
    reference keeps it as a registered buffer), and the create/transit
    workflows can rewrite it functionally.
    """

    features: int
    num_mode: int
    controller_rate: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, indicator: jax.Array) -> jax.Array:
        def init():
            rng_key = self.make_rng("params")

            def host(key_data) -> np.ndarray:
                seed = int(np.asarray(key_data).ravel()[-1]) & 0x7FFFFFFF
                return np.asarray(
                    make_codebook(seed, self.num_mode, self.features,
                                  self.controller_rate),
                    np.float32,
                )

            # pure_callback keeps the host-side dedupe loop while letting the
            # WHOLE model init run under jit (one compiled program instead of
            # thousands of eager dispatches — critical on remote TPU backends).
            return jax.pure_callback(
                host,
                jax.ShapeDtypeStruct((self.num_mode, self.features), jnp.float32),
                jax.random.key_data(rng_key),
            )

        codebook = self.variable("codebook", "codebook", init)
        return mc_gate(x, indicator, codebook.value)


def one_hot(labels: jax.Array, num_mode: int, dtype=jnp.float32) -> jax.Array:
    """One-hot indicator rows (reference uses F.one_hot().float() throughout)."""
    return jax.nn.one_hot(labels, num_mode, dtype=dtype)
