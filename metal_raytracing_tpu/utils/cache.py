"""Persistent JAX compilation cache.

The wavefront pipeline's jit (six Pallas traversal calls under one step)
takes minutes to compile; the persistent cache cuts cold-start from ~160s
to ~45s per process (measured, including through the remote-compile TPU
tunnel).  Enabled by the CLI and bench entry points; libraries importing
this package are not affected unless they opt in.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/metal_raytracing_tpu/jax")


def enable_compilation_cache(cache_dir: str = "") -> str:
    """Turn on the persistent compilation cache; returns the directory."""
    import jax

    cache_dir = (cache_dir or os.environ.get("MRT_JAX_CACHE_DIR")
                 or _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
