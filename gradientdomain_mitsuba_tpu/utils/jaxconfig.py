"""Central JAX configuration: persistent compilation cache.

The wavefront render programs are large (bounce loop over the full shading
system); first-time XLA compilation on the TPU backend takes minutes.  The
persistent cache makes every subsequent process start in milliseconds.
"""
from __future__ import annotations

import os

_CONFIGURED = False


def _host_tag() -> str:
    """Short fingerprint of this host's CPU feature set."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(
                        line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(
        platform.processor().encode()).hexdigest()[:12] if \
        platform.processor() else "generic"


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
        # scope the cache by the host's CPU feature set: XLA:CPU AOT
        # results baked for another machine type can SIGILL/SIGSEGV when
        # loaded (observed as sporadic pytest segfaults when the repo
        # moves between sandbox hosts), so hosts with different ISAs
        # must not share entries
        cache_dir = os.path.join(root, ".jax_cache", _host_tag())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
