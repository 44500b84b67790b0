"""Image grid writer (replaces torchvision save_image — reference
src/utils.py:48-52)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from ..utils import makedir_exist_ok


def to_uint8(img: np.ndarray, value_range=(-1.0, 1.0)) -> np.ndarray:
    """NHWC float in value_range → uint8 [0,255]."""
    lo, hi = value_range
    img = (np.asarray(img, np.float32) - lo) / (hi - lo)
    return (np.clip(img, 0, 1) * 255).round().astype(np.uint8)


def make_grid(img: np.ndarray, nrow: int = 10, padding: int = 2,
              pad_value: int = 0) -> np.ndarray:
    """Tile [N,H,W,C] uint8 into a grid image (torchvision make_grid analog).

    Uses the native fastimage path when built; numpy fallback otherwise."""
    from .native import make_grid_u8

    native = make_grid_u8(img, nrow, padding, pad_value)
    if native is not None:
        return native
    n, h, w, c = img.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.full(
        (nrows * (h + padding) + padding, ncol * (w + padding) + padding, c),
        pad_value, np.uint8,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = img[i]
    return grid


def save_image_grid(img, path: str, nrow: int = 10, padding: int = 2,
                    pad_value: int = 0, value_range=(-1.0, 1.0)):
    makedir_exist_ok(os.path.dirname(path) or ".")
    arr = to_uint8(np.asarray(img), value_range)
    grid = make_grid(arr, nrow, padding, pad_value)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    Image.fromarray(grid).save(path)
