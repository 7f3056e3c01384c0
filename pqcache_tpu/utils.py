"""Shared runtime utilities."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache — first compiles of the fused
    prefill/decode programs are expensive (minutes through a remote-compile
    tunnel); cache them across processes."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  "/tmp/pqcache_jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
