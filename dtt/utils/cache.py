"""Persistent XLA compilation cache.

Production-scale compiles through this machine's remote-compile tunnel take
2-6 minutes; the persistent cache turns warm starts into sub-second loads
(verified: 10.8 s -> 0.7 s on a conv stack). Every CLI/entry point calls
`enable_compilation_cache()` before building models.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    import jax

    path = cache_dir or os.environ.get("DTT_JAX_CACHE", _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never let caching break the run
        print(f"compilation cache disabled ({e})")
    return path
