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
# Disk-fill guard, not an LRU: jax doesn't touch mtimes on cache hits, so
# eviction is FIFO by write time; keep the budget generous (serialized
# flagship executables reach ~2 GB each) and override with DTT_JAX_CACHE_MAX.
_DEFAULT_MAX_BYTES = 12 << 30


def _prune(path: str, max_bytes: int) -> None:
    """Evict oldest entries until the cache fits the budget (no built-in
    LRU in this jax version; GB-scale entries otherwise fill the disk)."""
    try:
        entries = []
        with os.scandir(path) as it:
            for e in it:
                if e.is_file():
                    st = e.stat()
                    entries.append((st.st_mtime, st.st_size, e.path))
        total = sum(s for _, s, _ in entries)
        if total <= max_bytes:
            return
        entries.sort()  # oldest first
        for _, size, p in entries:
            if total <= max_bytes:
                break
            try:
                os.unlink(p)
                total -= size
            except OSError:
                pass
    except OSError:
        pass


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Idempotently enable the persistent compilation cache."""
    import jax

    path = cache_dir or os.environ.get("DTT_JAX_CACHE", _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        _prune(path, int(os.environ.get("DTT_JAX_CACHE_MAX",
                                        _DEFAULT_MAX_BYTES)))
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # never let caching break the run
        print(f"compilation cache disabled ({e})")
    return path
