"""EMA-codebook vector quantization.

Port of the math of reference src/modules/modules.py:6-46 (decay 0.99,
eps 1e-5, Laplace-smoothed cluster sizes, straight-through estimator) as a
functional flax module. The EMA buffers live in the ``vq_stats`` variable
collection; under data-parallel jit over a mesh the one-hot count / sum
reductions are computed with global-batch semantics (XLA inserts the
cross-device reduction), which the reference's single-process DataParallel
never had to consider.

Layout is channels-last: input is ``[..., D]``; nearest-code search is a
``[N, D] x [D, K]`` matmul that maps straight onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import weighted_mean


class VectorQuantizerEMA(nn.Module):
    embedding_size: int  # D
    num_embedding: int  # K
    decay: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, w=None):
        """Quantize ``x`` ``[..., D]`` → (quantized, commit_diff, code_indices).

        ``w`` [B]: optional per-sample validity mask (SPMD eval padding);
        masked samples are excluded from the commit diff and, under train,
        from the EMA counts/sums (train batches are never padded in
        practice — data/loader.py drops the last partial train batch).
        """
        D, K = self.embedding_size, self.num_embedding
        embedding = self.variable(
            "vq_stats", "embedding",
            lambda: jax.random.normal(self.make_rng("params"), (D, K)),
        )
        cluster_size = self.variable(
            "vq_stats", "cluster_size", lambda: jnp.zeros((K,))
        )
        embedding_mean = self.variable(
            "vq_stats", "embedding_mean", lambda: embedding.value
        )

        flat = x.reshape(-1, D).astype(jnp.float32)
        wf = None
        if w is not None:  # [B] -> one weight per spatial position, [N]
            wf = jnp.broadcast_to(
                w.astype(jnp.float32).reshape((-1,) + (1,) * (x.ndim - 2)),
                x.shape[:-1]).reshape(-1)
        emb = embedding.value
        # argmin_k |x - e_k|^2 via expanded form; the cross term is one MXU matmul.
        dist = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ emb
            + jnp.sum(emb**2, axis=0, keepdims=True)
        )
        ind = jnp.argmin(dist, axis=1)
        onehot = jax.nn.one_hot(ind, K, dtype=flat.dtype)
        code = ind.reshape(x.shape[:-1])
        quantize = self.embedding_code_from(emb, code)

        if train and self.is_mutable_collection("vq_stats"):
            d = self.decay
            oh = onehot if wf is None else onehot * wf[:, None]
            new_cluster = cluster_size.value * d + oh.sum(0) * (1 - d)
            emb_sum = flat.T @ oh  # [D, K]
            new_mean = embedding_mean.value * d + emb_sum * (1 - d)
            n = new_cluster.sum()
            smoothed = (new_cluster + self.eps) / (n + K * self.eps) * n
            cluster_size.value = new_cluster
            embedding_mean.value = new_mean
            embedding.value = new_mean / smoothed[None, :]

        x32 = x.astype(jnp.float32)
        sq = (jax.lax.stop_gradient(quantize) - x32) ** 2
        # wf is w broadcast uniformly within each sample, so the per-position
        # weighted mean equals the per-sample weighted_mean shared by every
        # other masked loss (only the EMA counts above need per-position wf)
        diff = weighted_mean(sq, w)
        quantize = x32 + jax.lax.stop_gradient(quantize - x32)
        return quantize.astype(x.dtype), diff, code

    @staticmethod
    def embedding_code_from(embedding: jax.Array, code: jax.Array) -> jax.Array:
        """Gather codebook vectors: ``[..., ]`` int codes → ``[..., D]``."""
        return jnp.take(embedding.T, code, axis=0)

    def embedding_code(self, code: jax.Array) -> jax.Array:
        """Lookup against the live variable (reference modules.py:45-46)."""
        emb = self.get_variable("vq_stats", "embedding")
        return self.embedding_code_from(emb, code)
