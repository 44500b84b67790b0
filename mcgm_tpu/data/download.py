"""Download / verify / extract infrastructure for dataset acquisition.

Behavioral equivalent of the reference's dataset plumbing
(/root/reference/src/datasets/utils.py: download_url, extract_file) without
the torch dependency: stdlib urllib + hashlib + zipfile/tarfile/gzip. In
zero-egress environments the downloader fails with a manual-placement
message naming the exact path to drop the archive at.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import shutil
import tarfile
import urllib.request
import zipfile


def check_md5(path: str, md5: str | None, chunk: int = 1 << 20) -> bool:
    """True if the file at ``path`` matches ``md5`` (or md5 is None)."""
    if md5 is None:
        return os.path.exists(path)
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest() == md5


def download_url(url: str, root: str, filename: str | None = None,
                 md5: str | None = None, verbose: bool = True) -> str:
    """Fetch ``url`` into ``root`` unless a verified copy already exists.

    Returns the local path. When the network is unreachable, raises
    RuntimeError telling the user where to place the archive manually —
    the reference has no such fallback, but zero-egress TPU pods need it.
    """
    filename = filename or os.path.basename(url)
    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, filename)
    if os.path.exists(path) and check_md5(path, md5):
        return path
    try:
        if verbose:
            print(f"downloading {url} -> {path}")
        req = urllib.request.Request(url, headers={"User-Agent": "mcgm_tpu"})
        with urllib.request.urlopen(req) as r, open(path + ".part", "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(path + ".part", path)
    except Exception as e:  # no egress / bad mirror
        raise RuntimeError(
            f"could not download {url} ({e!r}). Place the file manually at "
            f"{path} and re-run."
        ) from e
    if not check_md5(path, md5):
        raise RuntimeError(f"md5 mismatch for {path} (expected {md5})")
    return path


def _safe_zip_members(z: "zipfile.ZipFile", dest: str):
    """Yield only members that resolve inside ``dest`` (no path traversal).

    Guards unverified archives (COIL100 ships with no published md5, matching
    the reference's ``md5=None`` at /root/reference/src/datasets/coil.py:14).
    """
    base = os.path.realpath(dest)
    for m in z.infolist():
        target = os.path.realpath(os.path.join(dest, m.filename))
        if target == base or target.startswith(base + os.sep):
            yield m


def extract_file(path: str, dest: str | None = None) -> None:
    """Extract zip / tar(.gz|.bz2) / plain .gz next to the archive."""
    dest = dest or os.path.dirname(path)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest, members=list(_safe_zip_members(z, dest)))
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            try:
                t.extractall(dest, filter="data")  # traversal-safe filter
            except TypeError:  # Python < 3.9.17/3.10.12/3.11.4: no filter kwarg
                base = os.path.realpath(dest)
                members, skipped = [], []
                for m in t.getmembers():
                    inside = os.path.realpath(
                        os.path.join(dest, m.name)).startswith(base + os.sep)
                    # links are dropped wholesale here (filter='data' keeps
                    # safe in-tree ones) — warn so a dedup'd archive missing
                    # files is traceable to the interpreter version
                    if inside and not (m.issym() or m.islnk()):
                        members.append(m)
                    else:
                        skipped.append(m.name)
                if skipped:
                    import warnings
                    warnings.warn(
                        f"extract_file({os.path.basename(path)}): skipped "
                        f"{len(skipped)} unsafe/link members (no tarfile "
                        f"filter= on this Python), e.g. {skipped[:3]}")
                t.extractall(dest, members=members)
    elif path.endswith(".gz"):
        out = os.path.join(dest, os.path.basename(path)[:-3])
        with gzip.open(path, "rb") as f, open(out, "wb") as g:
            shutil.copyfileobj(f, g)
    # any other extension: already a flat file, nothing to extract


def ensure_raw(files: list[tuple[str, str | None]], raw_folder: str,
               verbose: bool = True) -> None:
    """Download + extract each (url, md5) into ``raw_folder`` idempotently."""
    for url, md5 in files:
        filename = os.path.basename(url)
        path = os.path.join(raw_folder, filename)
        if not (os.path.exists(path) and check_md5(path, md5)):
            download_url(url, raw_folder, filename, md5, verbose=verbose)
        extract_file(path)
