"""Persistent XLA compilation cache, shared by every script.

Cold compiles go through the tunneled remote AOT service here (~minutes
for the big programs, PERF.md "Compile time"); the persistent cache makes
every warm local run skip unchanged compiles. One helper so the cache
location/policy lives in exactly one place (12 scripts used to carry
diverging copies of this block).
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compile_cache(min_compile_secs: int = 2):
    """Point jax at the repo's ``.jax_cache/`` dir (call before first use).

    Returns the cache dir, or ``None`` when this jax exposes no cache
    flags (older releases) — callers proceed without a cache either way.
    """
    import jax

    cache_dir = os.path.join(_REPO_ROOT, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        return None
    return cache_dir
