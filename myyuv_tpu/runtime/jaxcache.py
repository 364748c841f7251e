"""Persistent XLA compilation cache setup.

TPU compiles on this machine go through a remote-compile tunnel and cost
20-300 s for the larger codec graphs; caching them on disk makes every
process after the first start instantly. Call ``enable()`` before the first
jit execution (idempotent; respects an explicit JAX_COMPILATION_CACHE_DIR).
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT = Path(__file__).resolve().parent.parent.parent / ".jax_cache"


def enable(path: str | None = None) -> None:
    import jax

    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or str(_DEFAULT))
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these options: in-memory cache only
