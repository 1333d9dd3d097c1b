"""ModelRegistry — URI-scheme model resolution with a local cache.

Parity with the reference (``/root/reference/marie/registry/model_registry.py:266``):
``zoo://name`` resolves against local model directories, ``hf://repo``
against a HuggingFace snapshot (gated on network/cache availability),
plain paths pass through.  Checkpoints themselves are orbax/msgpack
flax param trees (see :mod:`marie_tpu.registry.checkpoints`).
"""

import os
from abc import ABC, abstractmethod
from typing import Dict, List, Optional

from marie_tpu.excepts import ModelRegistryError
from marie_tpu.logging_core import MarieLogger

_DEFAULT_ZOO_DIRS = ["/mnt/models", os.path.expanduser("~/.marie/model_zoo"), "./model_zoo"]


class ModelRegistryHandler(ABC):
    @abstractmethod
    def get_supported_prefixes(self) -> List[str]: ...

    @abstractmethod
    def resolve(self, name: str, **kwargs) -> str:
        """Return a local directory for the model."""

    @abstractmethod
    def exists(self, name: str) -> bool: ...


class NativeModelRegistryHandler(ModelRegistryHandler):
    """``zoo://`` — local model-zoo directories with marie.json metadata."""

    def __init__(self, zoo_dirs: Optional[List[str]] = None):
        self.zoo_dirs = zoo_dirs or list(_DEFAULT_ZOO_DIRS)

    def get_supported_prefixes(self) -> List[str]:
        return ["zoo://"]

    def _candidates(self, name: str) -> List[str]:
        name = name[len("zoo://") :] if name.startswith("zoo://") else name
        return [os.path.join(d, name) for d in self.zoo_dirs]

    def exists(self, name: str) -> bool:
        return any(os.path.isdir(p) for p in self._candidates(name))

    def resolve(self, name: str, **kwargs) -> str:
        for p in self._candidates(name):
            if os.path.isdir(p):
                return p
        raise ModelRegistryError(
            f"model {name!r} not found in zoo dirs {self.zoo_dirs}"
        )


class HuggingFaceModelRegistryHandler(ModelRegistryHandler):
    """``hf://repo-id`` — resolves from the local HF cache (no downloads in
    zero-egress environments; presence is required)."""

    def get_supported_prefixes(self) -> List[str]:
        return ["hf://"]

    def _cache_path(self, name: str) -> Optional[str]:
        repo = name[len("hf://") :]
        base = os.path.expanduser(
            os.environ.get("HF_HOME", "~/.cache/huggingface")
        )
        snap = os.path.join(base, "hub", f"models--{repo.replace('/', '--')}")
        if os.path.isdir(snap):
            snaps = os.path.join(snap, "snapshots")
            if os.path.isdir(snaps):
                subdirs = sorted(os.listdir(snaps))
                if subdirs:
                    return os.path.join(snaps, subdirs[-1])
        return None

    def exists(self, name: str) -> bool:
        return self._cache_path(name) is not None

    def resolve(self, name: str, **kwargs) -> str:
        p = self._cache_path(name)
        if p is None:
            raise ModelRegistryError(
                f"{name!r} not in the local HuggingFace cache and downloads "
                "are unavailable in this environment"
            )
        return p


class ModelRegistry:
    _handlers: Dict[str, ModelRegistryHandler] = {}
    logger = MarieLogger("ModelRegistry")

    @classmethod
    def register_handler(cls, handler: ModelRegistryHandler) -> None:
        for prefix in handler.get_supported_prefixes():
            cls._handlers[prefix] = handler

    @classmethod
    def _ensure_defaults(cls) -> None:
        if not cls._handlers:
            cls.register_handler(NativeModelRegistryHandler())
            cls.register_handler(HuggingFaceModelRegistryHandler())

    @classmethod
    def get(cls, name: str, **kwargs) -> str:
        """Resolve a model name/URI to a local directory."""
        cls._ensure_defaults()
        for prefix, handler in cls._handlers.items():
            if name.startswith(prefix):
                return handler.resolve(name, **kwargs)
        if os.path.isdir(name):
            return name
        raise ModelRegistryError(f"cannot resolve model {name!r}")

    @classmethod
    def exists(cls, name: str) -> bool:
        cls._ensure_defaults()
        for prefix, handler in cls._handlers.items():
            if name.startswith(prefix):
                return handler.exists(name)
        return os.path.isdir(name)
