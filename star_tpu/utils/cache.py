"""Persistent XLA compilation cache.

Compiles through the axon tunnel cost 5-40 minutes for the big graphs; the
persistent cache makes repeat runs (bench, driver checks, CLI shape buckets)
near-instant across processes and rounds.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')


def enable_compile_cache(cache_dir: str | None = None,
                         min_compile_secs: float = 5.0) -> str:
    import jax
    cache_dir = cache_dir or os.environ.get('STAR_TPU_COMPILE_CACHE',
                                            DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      min_compile_secs)
    return cache_dir
