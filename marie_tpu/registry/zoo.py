"""In-repo model-zoo resolution shared by every component loader.

The reference resolves weights through ModelRegistry URI schemes
(``zoo://`` — marie/registry/model_registry.py:266); here the in-repo
``model_zoo/`` directory is the native zoo, with the registry as
fallback for configured external providers.
"""

import os
from typing import Any, Optional

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def zoo_checkpoint(name: str) -> Optional[str]:
    """Resolve a checkpoint directory by zoo name, or None."""
    local = os.path.join(_REPO_ROOT, "model_zoo", name)
    if os.path.isdir(local):
        return local
    try:
        from marie_tpu.registry import ModelRegistry

        if ModelRegistry.exists(f"zoo://{name}"):
            return ModelRegistry.get(f"zoo://{name}")
    except Exception:  # noqa: BLE001
        pass
    return None


def zoo_params(name: str) -> Optional[Any]:
    """Load a zoo checkpoint's params, or None when absent."""
    path = zoo_checkpoint(name)
    if not path:
        return None
    from marie_tpu.registry.checkpoints import load_params

    return load_params(path)
