#!/usr/bin/env python
"""Vendor a REAL-pixel image shard as a test fixture (round-3 verdict #8).

The reference's canonical datasets (CIFAR10/COIL100/Omniglot, reference
src/data.py:9-62) are not downloadable in a zero-egress environment, so
every end-to-end artifact so far ran on the Synthetic blobs. scikit-learn
ships a genuinely real image dataset inside the wheel — the UCI Optical
Recognition of Handwritten Digits shard (1,797 8x8 grayscale digit images,
10 classes; ``sklearn.datasets.load_digits``, public UCI data) — which
lets the data layer, training, generation, and the full FID-stats scoring
pipeline run on real pixels at least once (tests/test_real_data.py).

Packing follows the reference's own convention for small sources: images
are resized to the 32x32 protocol resolution (the reference resizes every
dataset with transforms.Resize((32,32)), src/data.py:58-59; here 4x
nearest-neighbor so the committed pixels stay exactly the scanned ones)
and intensities rescale 0..16 -> 0..255 uint8.

Writes tests/fixtures/real_digits_shard.npz:
  img    uint8 [1797, 32, 32, 1]  (NHWC, the framework's native layout)
  labels int32 [1797]
"""

from __future__ import annotations

import os

import numpy as np


def build_shard() -> tuple[np.ndarray, np.ndarray]:
    from sklearn.datasets import load_digits

    d = load_digits()
    img = np.asarray(d.images, np.float32)            # [N, 8, 8], 0..16
    img = np.round(img * (255.0 / 16.0)).astype(np.uint8)
    img = np.kron(img, np.ones((1, 4, 4), np.uint8))  # nearest 8->32
    return img[..., None], np.asarray(d.target, np.int32)


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures",
        "real_digits_shard.npz")
    img, labels = build_shard()
    np.savez_compressed(out, img=img, labels=labels)
    print(f"wrote {out}: img {img.shape} {img.dtype}, "
          f"{len(np.unique(labels))} classes, "
          f"{os.path.getsize(out) / 1024:.0f} KiB")


if __name__ == "__main__":
    main()
