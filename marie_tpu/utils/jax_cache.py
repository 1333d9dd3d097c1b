"""Persistent XLA compilation cache.

Compiles in this environment go through a remote service with
multi-minute latency spikes; caching compiled executables on disk makes
every program a one-time cost across processes and restarts (also the
right default for serving: executor restarts skip the 30-60s warmup).
"""

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/marie_tpu_xla")


def enable_persistent_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # cache EVERY program: compiles route through a remote service
        # whose per-call latency (not compile time) dominates, so even
        # sub-second programs are worth a disk hit — with the 0.5 s
        # floor a warm bench still missed 53/68 lookups (all the small
        # helper programs) and spent ~100 s in "compile" that was
        # actually remote round-trips
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # noqa: BLE001 — older jax without these knobs
        pass
