"""Persistent XLA compilation cache for the benchmark / campaign drivers
(VERDICT round-2 item #9: BGV N=16384 dotprod took 611 s to build cold;
reference-scale sweeps recompile the same programs every run).

JAX's persistent cache keys on (HLO, compile options, backend version), so
re-running a sweep with unchanged shapes loads the compiled executable from
disk instead of rebuilding it.  Call once at driver startup; tests don't
need it (CPU compiles are cheap and the cache would churn).
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "rfhe_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = path or os.environ.get("RFHE_TPU_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
