"""Persistent XLA compilation cache.

Compiles on this TPU's remote-compile transport cost minutes for the
scanned train step; the persistent cache makes that a once-ever cost per
(program, shape).  Kept inside the repo tree (the sandbox forbids writes
elsewhere) and gitignored.
"""

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str | None = None):
    global _enabled
    if _enabled:
        return
    import jax
    cache_dir = path or _DEFAULT
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
