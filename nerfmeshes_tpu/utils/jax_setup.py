"""Process-level JAX runtime setup shared by the CLIs / bench / driver."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes: TPU compiles of the
    large fused kernels take O(10s-minutes); the cache makes every run
    after the first instant."""
    import jax

    cache_dir = path or os.environ.get(
        "NERFMESHES_COMPILATION_CACHE", os.path.expanduser("~/.cache/nerfmeshes_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
