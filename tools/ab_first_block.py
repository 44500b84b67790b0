#!/usr/bin/env python
"""A/B: pallas-resident fused 128px first-D-block forward vs the XLA chain.

DESIGN.md's 128px root-cause section bounds a "pallas-resident fused
first-block" as the only true fix for the half-lane layout tax
(conv-pinned {3,0,2,1} layouts put C=64 in the lane dim). This experiment
measures the FORWARD half of that claim: ONE kernel computes

    h  = relu(conv3x3(x, w1)) * code          # [B,128,128,64], VMEM-only
    y  = conv4x4_stride2(h, w2) + conv1x1(avgpool2(x), w3)   # [B,64,64,64]

with the full-res h NEVER touching HBM (the XLA chain writes+reads it at
half-lane bandwidth). Mosaic constraints shaped the design:
- no >2D strided slices -> everything is phase-decomposed (h computed per
  (row,col)-parity plane; stride-2 conv2 reads whole planes);
- tpu.concatenate refuses slices with mismatched non-concat offsets ->
  conv1's im2col is PREcomputed phase-split in XLA (27 lanes per pixel,
  one aligned matmul per phase in-kernel) and conv2's im2col is assembled
  by scratch-buffer stores (stores relayout; vector concats don't).
Raw halo DMA hit a third constraint (memref_slice demands tile-aligned
slice shapes, forcing 128-lane padding on the 27-deep im2col = 4.7x waste)
so the whole-sample phase im2col rides a plain BlockSpec into VMEM
(4.1 MiB) and the kernel loops over row tiles internally.

Usage: python tools/ab_first_block.py [--accum] [--reps 20]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcgm_tpu.compile_cache import enable_compile_cache

enable_compile_cache("/tmp/mcgm_jax_cache")  # fenced: off under remote-compile axon

B, H, W, CIN, COUT = 64, 128, 128, 3, 64
RT = 8   # output rows per grid step (out res 64 -> 8 row tiles)
K1 = 9 * CIN            # conv1 im2col depth (27)


# ------------------------------------------------------------------ XLA ref
def xla_block(x, w1, code, w2, w3):
    """The production chain (bf16 operands, as ops/layers runs it)."""
    h = jax.lax.conv_general_dilated(
        x, w1, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = jax.nn.relu(h) * code[:, None, None, :].astype(h.dtype)
    y = jax.lax.conv_general_dilated(
        h, w2, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    sc = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID") * 0.25
    sc = jax.lax.conv_general_dilated(
        sc.astype(x.dtype), w3, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + sc


# ------------------------------------------------- host-side (XLA) prep
def make_phase_im2col(x):
    """xcol[p, q][b, J, K, :] = conv1 im2col patch of h position
    (2(J-1)+p, 2(K-1)+q): 27 lanes (a-major, b, c), zeros where the h
    position is outside [0,127]^2 (conv2's zero padding made explicit).

    J, K in [0, 66): h-phase rows -1..64 with a 1-slot guard each side.
    """
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # h taps, pad 1
    cols = jnp.concatenate(
        [xpad[:, a:a + 128, bb:bb + 128, :] for a in range(3)
         for bb in range(3)], axis=-1)                   # [B,128,128,27]
    # h rows -2..65*2+1: embed the valid 128 rows into a 132-slot frame so
    # phase J=0 (h rows -2/-1) and J=65 (h rows 128/129) read zeros
    colsp = jnp.pad(cols, ((0, 0), (2, 2), (2, 2), (0, 0)))
    # K padded 66 -> 72: Mosaic DMA slices on the tiled second-minor dim
    # must be 8-aligned; the 6 garbage cols are never read by conv2 taps
    planes = [[jnp.pad(colsp[:, p:p + 132:2, q:q + 132:2, :],
                       ((0, 0), (0, 0), (0, 6), (0, 0)))
               for q in (0, 1)] for p in (0, 1)]         # each [B,66,72,27]
    return jnp.stack([jnp.stack(r, 0) for r in planes], 0)


def make_pooled(x):
    xs = x.astype(jnp.float32)
    return (0.25 * (xs[:, 0::2, 0::2] + xs[:, 1::2, 0::2]
                    + xs[:, 0::2, 1::2] + xs[:, 1::2, 1::2])
            ).astype(jnp.bfloat16)                       # [B,64,64,3]


# --------------------------------------------------------------- the kernel
def _kernel(xcol_ref, pooled_ref, code_ref, w1_ref, w2_ref, w3_ref, out_ref,
            pat2, *, bblock, accum):
    b = pl.program_id(0)
    codes = code_ref[pl.ds(b * bblock, bblock), :]

    for rt in range(8):
        yacc = None
        # conv1 + relu + MC gate per phase for h-phase rows
        # j in [8rt-1, 8rt+9) (xcol J = j+1 in [8rt, 8rt+10)); write
        # conv2's im2col taps straight into the pat2 scratch
        for p in (0, 1):
            for q in (0, 1):
                tile = xcol_ref[p, q, :, 8 * rt:8 * rt + 10, :, :]
                m = tile.reshape(bblock * 10 * 72, K1)
                hv = jnp.dot(m, w1_ref[...],
                             preferred_element_type=jnp.float32)
                hv = hv.reshape(bblock, 10, 72, COUT)
                hv = jax.nn.relu(hv) * codes[:, None, None, :]
                hv = hv.astype(jnp.bfloat16)
                # conv2 taps on this phase: (a2,b2) with (a2-1)%2==p etc.
                for a2 in range(4):
                    u2 = a2 - 1
                    if u2 % 2 != p:
                        continue
                    du2 = u2 // 2
                    for b2 in range(4):
                        v2 = b2 - 1
                        if v2 % 2 != q:
                            continue
                        dv2 = v2 // 2
                        t = a2 * 4 + b2
                        tap = hv[:, du2 + 1:du2 + 9, dv2 + 1:dv2 + 65, :]
                        if accum:
                            # 16 accumulated K=64 matmuls instead of the
                            # pat2-store im2col (A/B: stores vs small dots)
                            contrib = jnp.dot(
                                tap.reshape(bblock * 8 * 64, COUT),
                                w2_ref[t * COUT:(t + 1) * COUT, :],
                                preferred_element_type=jnp.float32)
                            yacc = contrib if yacc is None else yacc + contrib
                        else:
                            pat2[:, :, :, t * COUT:(t + 1) * COUT] = tap
        if accum:
            y = yacc.reshape(bblock, 8, 64, COUT)
        else:
            m2 = pat2[...].reshape(bblock * 8 * 64, 16 * COUT)
            y = jnp.dot(m2, w2_ref[...], preferred_element_type=jnp.float32)
            y = y.reshape(bblock, 8, 64, COUT)

        sc = jnp.dot(
            pooled_ref[:, 8 * rt:8 * rt + 8].reshape(bblock * 8 * 64, CIN),
            w3_ref[...], preferred_element_type=jnp.float32)
        out_ref[:, 8 * rt:8 * rt + 8] = (
            y + sc.reshape(bblock, 8, 64, COUT)).astype(jnp.bfloat16)


def pallas_block(x, w1, code, w2, w3, bblock=2, accum=False):
    xcol = make_phase_im2col(x)
    pooled = make_pooled(x)
    kern = functools.partial(_kernel, bblock=bblock, accum=accum)
    grid = (B // bblock,)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, 2, bblock, 66, 72, K1),
                         lambda b: (0, 0, b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bblock, 64, 64, CIN), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full code table
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bblock, 64, 64, COUT),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 64, 64, COUT), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((bblock, 8, 64, 16 * COUT), jnp.bfloat16),
        ],
    )(xcol, pooled, code, w1.reshape(K1, COUT), w2.reshape(16 * COUT, COUT),
      w3.reshape(CIN, COUT))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bblock", type=int, default=1)  # 2 exceeds the 16M scoped-vmem limit
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--accum", action="store_true",
                    help="conv2 via 16 accumulated K=64 matmuls instead of "
                         "the scratch-store im2col")
    args = ap.parse_args()

    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 5)
    x = jax.random.normal(ks[0], (B, H, W, CIN), jnp.bfloat16)
    w1 = (jax.random.normal(ks[1], (3, 3, CIN, COUT), jnp.float32)
          * 0.1).astype(jnp.bfloat16)
    w2 = (jax.random.normal(ks[2], (4, 4, COUT, COUT), jnp.float32)
          * 0.05).astype(jnp.bfloat16)
    w3 = (jax.random.normal(ks[3], (1, 1, CIN, COUT), jnp.float32)
          * 0.1).astype(jnp.bfloat16)
    code = (jax.random.uniform(ks[4], (B, COUT)) > 0.5).astype(jnp.float32)

    ref = jax.jit(xla_block)
    got_ref = np.asarray(ref(x, w1, code, w2, w3), np.float32)

    pal = jax.jit(functools.partial(pallas_block, bblock=args.bblock,
                                    accum=args.accum))
    got = np.asarray(pal(x, w1, code, w2, w3), np.float32)
    err = np.abs(got - got_ref)
    denom = np.maximum(np.abs(got_ref), 1e-3)
    print(f"max abs err {err.max():.4f}  max rel {np.max(err/denom):.4f}")
    assert np.allclose(got, got_ref, atol=0.25, rtol=0.1), \
        "pallas kernel does not match the XLA chain"

    def timeit(fn):
        zs = [x + jnp.bfloat16(i * 1e-3) for i in range(5)]
        jax.block_until_ready(fn(zs[0], w1, code, w2, w3))
        t0 = time.perf_counter()
        for i in range(args.reps):
            out = fn(zs[i % 5], w1, code, w2, w3)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.reps

    t_ref = timeit(ref)
    t_pal = timeit(pal)
    print(f"XLA chain : {t_ref*1e3:8.3f} ms")
    print(f"pallas    : {t_pal*1e3:8.3f} ms   ({t_ref/t_pal:.2f}x)")


if __name__ == "__main__":
    main()
