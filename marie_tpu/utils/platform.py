"""Platform selection that actually works under this environment's
pre-imported accelerator plugin.

``JAX_PLATFORMS=cpu python script.py`` is NOT enough where a
sitecustomize registers an accelerator backend before user code runs —
the env var is consulted too late.  ``honor_jax_platforms()`` re-applies
the env choice through ``jax.config`` after import (idempotent, no-op
when the env var is unset or the backend is already initialized to the
requested platform).  Example scripts and CLI entrypoints call this so
the documented ``JAX_PLATFORMS=cpu`` invocation behaves.
"""

import os

__all__ = ["honor_jax_platforms"]


def honor_jax_platforms() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax

    try:
        from jax._src import xla_bridge as _xb

        if getattr(_xb, "_backends", None):
            return  # a backend is live; flipping now would be a no-op
    except Exception:  # noqa: BLE001
        pass
    jax.config.update("jax_platforms", want)
