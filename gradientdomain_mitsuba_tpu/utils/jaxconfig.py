"""Central JAX configuration: persistent compilation cache.

The wavefront render programs are large (bounce loop over the full shading
system); first-time XLA compilation on the TPU backend takes minutes.  The
persistent cache makes every subsequent process start in milliseconds.
"""
from __future__ import annotations

import os

_CONFIGURED = False


def configure():
    global _CONFIGURED
    if _CONFIGURED:
        return
    _CONFIGURED = True
    import jax

    cache_dir = os.environ.get("GDMT_JAX_CACHE")
    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
