"""Checkpoint / resume.

Same artifact semantics as the reference (reference src/train_vae.py:83-92,
src/utils.py:237-256): a ``{tag}_checkpoint`` written every epoch plus a
``{tag}_best`` copy on pivot improvement; payload carries cfg, next epoch,
model/optimizer/scheduler state and the logger history for full provenance.
Resume modes: 0 fresh / 1 full resume / 2 warm-start weights only.

Tensors are stored as numpy inside a single pickle — a deliberate,
dependency-light format (the arrays here are tens of MB; orbax sharded
checkpointing is unnecessary at this scale and this format is
inspectable/portable).
"""

from __future__ import annotations

import os
import shutil
import threading

import jax

from ..utils import ckpt_path, load, makedir_exist_ok, save, to_numpy_tree


def save_checkpoint(cfg: dict, tag: str, payload: dict, kind: str = "checkpoint"):
    path = ckpt_path(cfg, tag, kind)
    save(to_numpy_tree(payload), path)
    return path


class AsyncCheckpointer:
    """Overlap the checkpoint fetch+pickle+write (and the optional _best
    copy) with the next epoch's compute.

    Immutability alone is NOT enough to hand live state trees to a writer
    thread: the train steps donate their TrainState (``donate_argnums=0``),
    so the next epoch's first step consumes the very buffers the writer
    would still be fetching — observed as ``Array has been deleted`` in the
    writer (or a hung fetch, since a jitted identity aliases its input
    buffer on this backend). ``submit`` therefore snapshots every device
    array through ONE jitted ``Array.copy()`` program on the main thread —
    an async device-to-device copy into fresh buffers that donation cannot
    touch — before the writer starts. One outstanding write at a time
    (epoch N+1's submit joins epoch N's writer), matching the reference's
    at-most-one-epoch-lost guarantee (reference train_vae.py:83-92).
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._error: BaseException | None = None

    @staticmethod
    @jax.jit
    def _device_copy(arrs):
        return [a.copy() for a in arrs]

    @classmethod
    def _snapshot(cls, payload):
        leaves, treedef = jax.tree_util.tree_flatten(payload)
        idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
        if idx:
            copies = cls._device_copy([leaves[i] for i in idx])
            for i, c in zip(idx, copies):
                leaves[i] = c
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def submit(self, cfg: dict, tag: str, payload: dict,
               copy_to_best: bool = False) -> None:
        self.wait()
        payload = self._snapshot(payload)

        def work():
            try:
                save_checkpoint(cfg, tag, payload)
                if copy_to_best:
                    copy_best(cfg, tag)
            except BaseException as e:  # re-raised on the main thread
                self._error = e

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Join the outstanding write; re-raise any writer failure here so a
        full disk / unpicklable payload surfaces in the training loop
        instead of silently leaving stale checkpoints behind."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        err, self._error = getattr(self, "_error", None), None
        if err is not None:
            raise RuntimeError("async checkpoint write failed") from err


def copy_best(cfg: dict, tag: str):
    """Copy checkpoint → best (reference shutil.copy at train_vae.py:89-92)."""
    src = ckpt_path(cfg, tag, "checkpoint")
    dst = ckpt_path(cfg, tag, "best")
    makedir_exist_ok(os.path.dirname(dst))
    shutil.copy(src, dst)


def load_checkpoint(cfg: dict, tag: str, kind: str = "checkpoint") -> dict | None:
    path = ckpt_path(cfg, tag, kind)
    if not os.path.exists(path):
        return None
    return load(path)


def resume(cfg: dict, tag: str, kind: str = "checkpoint", verbose: bool = True):
    """Return checkpoint payload or None (reference utils.py:237-256)."""
    ckpt = load_checkpoint(cfg, tag, kind)
    if ckpt is None:
        if verbose:
            print(f"Not exists model tag: {tag}, start from scratch")
        return None
    if verbose:
        print(f"Resume from {ckpt['epoch']}")
    return ckpt
