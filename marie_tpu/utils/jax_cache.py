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
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — older jax without these knobs
        pass
