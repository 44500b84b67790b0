#!/usr/bin/env python
"""Measure the PyTorch reference's MCGAN training step and derive the
per-chip baseline used by bench.py's ``vs_baseline``.

Two outputs, both written to stdout as JSON:

1. ``torch_cpu_images_per_sec`` — the reference's actual fused step
   (5 D updates + 1 G update, reference src/train_gan.py:139-176) timed on
   this host's CPU with the reference's own model code imported from
   /root/reference/src (run, never copied). A hard measured anchor.

2. ``v100_fp32_bound_images_per_sec`` — the FLOPs-derived upper bound for the
   reference on the GPU it was written for. The reference trains in pure
   fp32 (no autocast/AMP anywhere in src/). FLOPs per image per full step
   are counted analytically from the conv/linear shapes (forward cost; a
   backward pass costs ~2x forward, and the 5:1 protocol repeats the
   D(real)+G+D(fake) graph 5 times + the G+D graph once). Dividing V100
   fp32 peak (15.7 TFLOPS) at a GENEROUS 50% sustained utilization by
   FLOPs/image yields an upper bound the real reference cannot exceed —
   i.e. a baseline biased AGAINST this framework.

Usage: python tools/measure_torch_baseline.py [--batch 16] [--steps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REF = "/root/reference/src"


def build_reference_model():
    """Instantiate the reference mcgan exactly as train_gan.py would."""
    os.chdir(REF)  # reference config.py loads ./config.yml
    sys.path.insert(0, REF)
    from config import cfg

    cfg["data_name"] = "CIFAR10"
    cfg["data_shape"] = [3, 32, 32]
    cfg["classes_size"] = 10
    cfg["controller_rate"] = 0.5
    cfg["gan"] = {
        "latent_size": 128,
        "generator_hidden_size": [256, 256, 256, 256],
        "discriminator_hidden_size": [128, 128, 128, 128],
    }
    cfg["device"] = "cpu"
    import models

    return models.mcgan()


def time_reference_step(model, batch: int, steps: int) -> float:
    import torch

    opt_g = torch.optim.Adam(model.generator.parameters(),
                             lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(model.discriminator.parameters(),
                             lr=2e-4, betas=(0.5, 0.999))
    img = torch.rand(batch, 3, 32, 32) * 2 - 1
    label = torch.arange(batch) % 10
    model.train(True)

    def one_step():
        for _ in range(5):
            opt_d.zero_grad(); opt_g.zero_grad()
            d_x = model.discriminate(img, label)
            z1 = torch.randn(batch, 128)
            fake = model.generate(label, z1)
            d_g_z1 = model.discriminate(fake.detach(), label)
            d_loss = (torch.nn.functional.relu(1.0 - d_x).mean()
                      + torch.nn.functional.relu(1.0 + d_g_z1).mean())
            d_loss.backward()
            opt_d.step()
        opt_d.zero_grad(); opt_g.zero_grad()
        z2 = torch.randn(batch, 128)
        fake = model.generate(label, z2)
        g_loss = -model.discriminate(fake, label).mean()
        g_loss.backward()
        opt_g.step()

    one_step()  # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    dt = time.perf_counter() - t0
    return batch * steps / dt


def conv_flops(cin, cout, k, h, w):
    """MACs*2 for a kxk conv producing (cout,h,w)."""
    return 2 * cin * cout * k * k * h * w


def analytic_flops_per_image() -> dict:
    """Forward FLOPs per image for G and D (conv+linear terms only; BN/ReLU/
    upsample/MC-gating are bandwidth-bound and ~free on a GPU roofline).

    Shapes from reference src/models/mcgan.py: G = linear 128->256*4*4 then
    3 GenResBlocks (256->256, stride 2: conv3x3 x2 at the UPSAMPLED res +
    1x1 shortcut) from 4px->32px, final conv3x3 256->3 at 32px.
    D = FirstDisResBlock at 32px (3->128 conv3x3, 128->128 conv3x3, 1x1
    shortcut, then avgpool to 16), DisResBlock 16->8 (two conv3x3 + 1x1),
    two DisResBlocks at 8px (two conv3x3 each, no downsample... reference
    uses stride list [2,2,1,1]), linear 128->1.
    """
    g = 2 * 128 * 256 * 16  # linear to 4x4x256
    for res in (8, 16, 32):  # GenResBlock convs run at the upsampled res
        g += conv_flops(256, 256, 3, res, res) * 2
        g += conv_flops(256, 256, 1, res, res)  # shortcut
    g += conv_flops(256, 3, 3, 32, 32)
    d = conv_flops(3, 128, 3, 32, 32) + conv_flops(128, 128, 3, 32, 32)
    d += conv_flops(3, 128, 1, 16, 16)  # first shortcut (pool then 1x1)
    d += conv_flops(128, 128, 3, 16, 16) * 2 + conv_flops(128, 128, 1, 8, 8)
    d += conv_flops(128, 128, 3, 8, 8) * 4  # two stride-1 blocks
    d += 2 * 128 * 1
    return {"G_fwd": g, "D_fwd": d}


def derive_bound() -> dict:
    f = analytic_flops_per_image()
    g, d = f["G_fwd"], f["D_fwd"]
    # One full reference step per image:
    #   5 x [ D fwd (real) + G fwd + D fwd (fake) + backward(D graph over
    #         both halves: ~2x(2D fwd); G is detached so no G backward) ]
    #   1 x [ G fwd + D fwd + backward through both: ~2x(G+D) ]
    d_iter = 5
    step = d_iter * (2 * d + g + 2 * (2 * d)) + (g + d + 2 * (g + d))
    v100_fp32_peak = 15.7e12
    utilization = 0.50  # generous for torch fp32 convs at 32px
    return {
        "flops_per_image_per_step": step,
        "G_fwd_flops_per_image": g,
        "D_fwd_flops_per_image": d,
        "v100_fp32_bound_images_per_sec": v100_fp32_peak * utilization / step,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    out = derive_bound()
    if not args.skip_torch:
        model = build_reference_model()
        out["torch_cpu_images_per_sec"] = round(
            time_reference_step(model, args.batch, args.steps), 2)
        out["torch_cpu_batch"] = args.batch
        import torch

        out["torch_threads"] = torch.get_num_threads()
    out["v100_fp32_bound_images_per_sec"] = round(
        out["v100_fp32_bound_images_per_sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
