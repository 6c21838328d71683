"""Persistent XLA compilation cache enabling that actually takes effect.

The ambient environment's sitecustomize imports jax at interpreter
start, so setting JAX_COMPILATION_CACHE_DIR from a script's module body
comes too late -- jax has already read its env config and
``jax.config.jax_compilation_cache_dir`` stays None (this silently cost
round 3 the cache: the driver's 113 s / our 573 s cold compiles re-paid
on every fresh process).  ``jax.config.update`` works at runtime; every
bench/tool entrypoint calls ``enable_persistent_cache()`` instead of
setting env vars.
"""

from __future__ import annotations

import os

REPO_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str = REPO_CACHE,
                            min_compile_secs: float = 5.0) -> str:
    """Point jax's persistent compilation cache at ``path`` (default: the
    repo-level .jax_cache, which ships primed entries for the big merge
    programs so fresh checkouts skip the cold compile)."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    # accept cache hits regardless of which process wrote them
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches",
                          "all")
    except Exception:
        pass  # older jax: flag absent; directory cache still works
    return path
