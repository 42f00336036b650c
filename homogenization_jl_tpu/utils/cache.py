"""Persistent XLA compilation cache setup.

This host has a single CPU core and jit compiles are expensive (and
occasionally stalled by kernel-side activity); caching compiled executables
across processes makes tests and repeated driver runs cheap.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "HZT_COMPILATION_CACHE", os.path.expanduser("~/.cache/hzt_xla_cache")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags
