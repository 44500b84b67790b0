"""Native fastimage library vs the Python fallbacks."""

import numpy as np
import pytest
from PIL import Image

from mcgm_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native fastimage not built (no toolchain)")
    return True


def test_resize_matches_pil(lib):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (4, 128, 128, 3), dtype=np.uint8)
    ours = native.resize_bilinear_u8(img, 32)
    for i in range(4):
        ref = np.asarray(Image.fromarray(img[i]).resize((32, 32), Image.BILINEAR))
        diff = np.abs(ours[i].astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()  # fixed-point vs float rounding


def test_resize_upscale_matches_pil(lib):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (2, 28, 28, 1), dtype=np.uint8)
    ours = native.resize_bilinear_u8(img, 32)
    for i in range(2):
        ref = np.asarray(Image.fromarray(img[i, ..., 0], "L").resize(
            (32, 32), Image.BILINEAR))[..., None]
        assert np.abs(ours[i].astype(int) - ref.astype(int)).max() <= 1


def test_grid_matches_numpy(lib):
    from mcgm_tpu.io.images import make_grid

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (7, 8, 8, 3), dtype=np.uint8)
    got = native.make_grid_u8(img, ncol=3, padding=2, pad_value=9)
    # numpy fallback reference
    n, h, w, c = img.shape
    nrow = 3
    rows = (n + nrow - 1) // nrow
    ref = np.full((rows * (h + 2) + 2, nrow * (w + 2) + 2, c), 9, np.uint8)
    for i in range(n):
        r, col = divmod(i, nrow)
        ref[r * 10 + 2: r * 10 + 10, col * 10 + 2: col * 10 + 10] = img[i]
    assert np.array_equal(got, ref)
