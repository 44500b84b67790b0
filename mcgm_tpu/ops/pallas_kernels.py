"""Pallas TPU kernels for the hot ops (SURVEY.md §2.11 native-tier items).

1. :func:`mc_gated_matmul` — fused ``(x @ w) * (indicator @ codebook)``:
   the MC gate (reference src/modules/modules.py:71-76) applied in the matmul
   epilogue while the output tile is still in VMEM, so the mask never costs a
   separate HBM round-trip. Mask is constant w.r.t. gradients (custom VJP
   mirrors the reference's ``detach``).
2. :func:`vq_assign` — fused nearest-code search for VQ
   (reference src/modules/modules.py:21-26): per input tile the ``[TN, K]``
   distance matrix lives only in VMEM; HBM sees just the argmin indices and
   the gathered codebook rows.

Both kernels run compiled on TPU and under ``interpret=True`` on CPU (the
test-suite path). The plain-XLA implementations in ``ops.controller`` /
``ops.vq`` remain the default production path — XLA already fuses the mask
multiply into conv/matmul epilogues (measured: MCGAN and CGAN train at
identical throughput), so these kernels exist as validated drop-in
replacements for shapes/fusions XLA misses, not as a default override.
They are exact-match tested against the XLA semantics in
tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ----------------------------------------------------------- gated matmul
def _mc_matmul_kernel(x_ref, w_ref, ind_ref, cb_ref, out_ref):
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    code = jnp.dot(ind_ref[:], cb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = acc * code


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def mc_gated_matmul(x, w, indicator, codebook):
    return _mc_gated_matmul_impl(x, w, indicator, codebook)


def _mc_gated_matmul_impl(x, w, indicator, codebook, interpret=None):
    M, K = x.shape
    K2, N = w.shape
    assert K == K2
    num_mode = codebook.shape[0]
    interpret = (not _on_tpu()) if interpret is None else interpret
    TM = min(_round_up(M, 8), 256)
    TN = min(_round_up(N, 128), 512)
    Mp, Np = _round_up(M, TM), _round_up(N, TN)
    xp = jnp.pad(x, ((0, Mp - M), (0, 0)))
    indp = jnp.pad(indicator, ((0, Mp - M), (0, 0)))
    wp = jnp.pad(w, ((0, 0), (0, Np - N)))
    cbp = jnp.pad(codebook, ((0, 0), (0, Np - N)))
    out = pl.pallas_call(
        _mc_matmul_kernel,
        grid=(Mp // TM, Np // TN),
        in_specs=[
            pl.BlockSpec((TM, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, num_mode), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_mode, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=interpret,
    )(xp.astype(jnp.float32), wp.astype(jnp.float32),
      indp.astype(jnp.float32), cbp.astype(jnp.float32))
    return out[:M, :N]


def _mc_fwd(x, w, indicator, codebook):
    out = _mc_gated_matmul_impl(x, w, indicator, codebook)
    return out, (x, w, indicator, codebook)


def _mc_bwd(res, g):
    x, w, indicator, codebook = res
    code = indicator @ codebook  # mask is non-differentiable (reference detach)
    gm = g * code
    dx = gm @ w.T
    dw = x.T @ gm
    return dx, dw, None, None


mc_gated_matmul.defvjp(_mc_fwd, _mc_bwd)


# ------------------------------------------------------------- vq assign
def _vq_assign_kernel(x_ref, emb_ref, e2_ref, ind_ref):
    x = x_ref[:]
    cross = jnp.dot(x, emb_ref[:], preferred_element_type=jnp.float32)
    # |x|^2 is constant per row for the argmin — skip it.
    dist = e2_ref[:] - 2.0 * cross
    ind_ref[:, 0] = jnp.argmin(dist, axis=1).astype(jnp.int32)


def vq_assign(flat, embedding, interpret=None):
    """Nearest-code indices for ``flat [N, D]`` against ``embedding [D, K]``.

    The full ``[N, K]`` distance matrix stays in VMEM per tile; only the
    ``[N]`` int32 indices reach HBM.
    """
    N, D = flat.shape
    D2, K = embedding.shape
    assert D == D2
    interpret = (not _on_tpu()) if interpret is None else interpret
    TN = min(_round_up(N, 8), 512)
    Np = _round_up(N, TN)
    xp = jnp.pad(flat, ((0, Np - N), (0, 0)))
    e2 = jnp.sum(embedding.astype(jnp.float32) ** 2, axis=0, keepdims=True)
    ind = pl.pallas_call(
        _vq_assign_kernel,
        grid=(Np // TN,),
        in_specs=[
            pl.BlockSpec((TN, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TN, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        interpret=interpret,
    )(xp.astype(jnp.float32), embedding.astype(jnp.float32), e2)
    return ind[:N, 0]
