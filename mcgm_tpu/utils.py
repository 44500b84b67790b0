"""Generic utilities: IO helpers and artifact paths.

Replaces the torch-centric helpers of reference src/utils.py with
numpy/pickle-based equivalents (no torch in the compute path).
"""

from __future__ import annotations

import os
import pickle

import numpy as np


def makedir_exist_ok(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def save(obj, path: str, mode: str = "pickle") -> None:
    """Persist an object (reference src/utils.py:26-36 analog).

    Atomic: writes to ``path + '.tmp'`` then ``os.replace``s into place, so
    an interrupted process (e.g. the async checkpoint writer killed mid-
    pickle) can never leave a truncated file where the last good checkpoint
    was — resume either sees the old complete file or the new one.
    """
    if mode not in ("pickle", "numpy"):
        raise ValueError("Not valid save mode")
    makedir_exist_ok(os.path.dirname(path) or ".")
    if mode == "numpy" and not path.endswith(".npy"):
        path = path + ".npy"  # np.save's own suffix convention
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        if mode == "pickle":
            pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
        else:
            np.save(f, obj, allow_pickle=True)
    os.replace(tmp, path)


def load(path: str, mode: str = "pickle"):
    if mode == "pickle":
        with open(path, "rb") as f:
            return pickle.load(f)
    elif mode == "numpy":
        return np.load(path, allow_pickle=True)
    raise ValueError("Not valid save mode")


def to_numpy_tree(tree):
    """Device→host copy of a pytree's ARRAY leaves (for checkpointing).

    Non-array leaves (Logger objects, ints, strings) pass through untouched —
    wrapping them with np.asarray would bury them in 0-d object arrays.
    """
    import jax

    def conv(x):
        if isinstance(x, (jax.Array, np.ndarray)):
            return np.asarray(x)
        return x

    return jax.tree_util.tree_map(conv, tree)


def ckpt_path(cfg: dict, tag: str, kind: str) -> str:
    return os.path.join(cfg["output_dir"], "model", f"{tag}_{kind}.pkl")


def npy_path(cfg: dict, name: str) -> str:
    return os.path.join(cfg["output_dir"], "npy", f"{name}.npy")


def result_path(cfg: dict, name: str, ext: str = "npy") -> str:
    return os.path.join(cfg["output_dir"], "result", f"{name}.{ext}")


def vis_path(cfg: dict, *parts: str) -> str:
    return os.path.join(cfg["output_dir"], "vis", *parts)
