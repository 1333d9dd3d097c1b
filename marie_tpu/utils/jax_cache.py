"""Persistent XLA compilation cache.

Compiles in this environment go through a remote service with
multi-minute latency spikes; caching compiled executables on disk makes
every program a one-time cost across processes and restarts (also the
right default for serving: executor restarts skip the 30-60s warmup).
"""

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/marie_tpu_xla")
_REPO_SEED_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "program_zoo",
    "xla",
)


def default_cache_dir() -> str:
    """Where compiled programs persist.

    TPU runs default to the repo-committed seed dir ``program_zoo/xla``
    so a FRESH HOST's first boot hits the HLO cache instead of paying
    multi-minute remote compiles (the r4 cold start, 47.9 s, was
    dominated by in-window compile misses; entries are keyed by device
    kind + jaxlib so foreign entries simply miss).  CPU runs (the test
    suite pins ``JAX_PLATFORMS=cpu``) stay under ``~/.cache`` to keep
    test churn out of the repo.  ``MARIE_XLA_CACHE`` overrides both.
    """
    env = os.environ.get("MARIE_XLA_CACHE")
    if env:
        return env
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return _DEFAULT_DIR
    return _REPO_SEED_DIR


def enable_persistent_cache(cache_dir: str = "") -> None:
    import jax

    cache_dir = cache_dir or default_cache_dir()
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
