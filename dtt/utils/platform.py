"""Honor explicit platform requests despite the machine's sitecustomize.

This machine's sitecustomize force-registers the experimental `axon` TPU
platform and prepends it to ``jax_platforms``, which silently overrides
``JAX_PLATFORMS=cpu`` (CLAUDE.md).  ``jax.config.update`` before first
backend use still wins, so every CLI entry point calls
``apply_platform_request()`` right after importing: setting
``DTT_PLATFORM=cpu`` (or passing ``platform="cpu"``) then gives a
deterministic CPU run — e.g. the CLI smoke test, which previously claimed
CPU but ran on the TPU tunnel and hung on cold remote compiles.
"""

from __future__ import annotations

import os


def apply_platform_request(platform: str | None = None) -> str | None:
    """Force the jax platform if requested; returns the applied platform.

    Priority: explicit ``platform`` arg, then the ``DTT_PLATFORM`` env var.
    No-op when neither is set (the normal TPU path). Must run before jax's
    first backend use; entry points call it immediately after arg parsing.
    """
    plat = platform or os.environ.get("DTT_PLATFORM")
    if not plat:
        return None
    import jax

    jax.config.update("jax_platforms", plat)
    return plat
