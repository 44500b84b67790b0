"""Guarded opt-in for JAX's persistent compilation cache.

The disk compile cache (``jax_compilation_cache_dir``) is a real win for the
reference's protocol shape — every experiment is its own OS process (reference
make.py emits one command per seed/cell), so without it each job pays the full
XLA compile, and with it job N's compiles are near-free loads (measured
43s -> 14s per tiny CLI job).

But under the remote-compile axon TPU backend (``PALLAS_AXON_REMOTE_COMPILE``)
the cache's serialization path deadlocks the client: a stock ``bench.py`` with
the cache enabled hangs indefinitely (round-3 BENCH rc=124; reproduced 3x),
while the identical program without it completes in seconds. A perf feature
that can wedge a production training job or the benchmark channel must be
fenced, so every enable goes through :func:`enable_compile_cache`:

- If ``PALLAS_AXON_REMOTE_COMPILE`` is set in the environment, the cache stays
  OFF unless ``MCGM_COMPILE_CACHE=1`` explicitly forces it (for future axon
  builds where the hang is fixed).
- ``MCGM_COMPILE_CACHE=0`` force-disables it everywhere.
- Otherwise (plain TPU/CPU backends) the cache is enabled as requested.

Returns True when the cache was actually enabled.
"""

from __future__ import annotations

import os


def compile_cache_allowed() -> bool:
    """Policy only (no side effects): may the persistent cache be enabled?"""
    forced = os.environ.get("MCGM_COMPILE_CACHE", "")
    if forced == "1":
        return True
    if forced == "0":
        return False
    # Known-bad backend: remote-compile axon deadlocks on cache serialization.
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE"):
        return False
    return True


def enable_compile_cache(cache_dir: str = "/tmp/mcgm_jax_cache") -> bool:
    """Enable the persistent compile cache at ``cache_dir`` if policy allows.

    Safe to call before or after JAX backend init (it only touches jax.config).
    Empty ``cache_dir`` is a no-op. Returns True iff the cache is now on.
    """
    if not cache_dir or not compile_cache_allowed():
        return False
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser(str(cache_dir)))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
