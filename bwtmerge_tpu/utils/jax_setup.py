"""JAX runtime configuration helpers."""

from __future__ import annotations

import os

_done = False


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Turn on the persistent XLA compile cache (idempotent).

    Remote-attached TPU compiles cost tens of seconds to minutes per program;
    the on-disk cache makes repeat CLI/bench invocations start warm.
    """
    global _done
    if _done:
        return
    _done = True
    import jax

    cache_dir = cache_dir or os.environ.get(
        "BWTMERGE_XLA_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "bwtmerge_tpu", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
