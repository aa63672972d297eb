"""JAX runtime initialization: persistent compilation cache.

Device programs here are shape-specialized (graph capacity, batch, ef), so
first-compile cost matters; the persistent cache makes warmup a one-time
cost per machine. Call init() before first device use (tests, bench, server
all do).
"""

from __future__ import annotations

import os

_DONE = False


def init(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    if os.environ.get("VSTPU_FORCE_CPU") == "1":
        # the axon sitecustomize sets the jax_platforms CONFIG, which
        # beats the JAX_PLATFORMS env var — smoke runs on a wedged-tunnel
        # day need an explicit config override to stay off the device
        jax.config.update("jax_platforms", "cpu")

    cache_dir = cache_dir or os.environ.get(
        "VSTPU_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass  # older jax without these flags
    _DONE = True
