"""marie_tpu — a TPU-native document-AI serving framework.

Re-implements the capabilities of Marie-AI (gregbugaj/marie-icr) with a
JAX/XLA/Pallas compute core and a gRPC/HTTP serving spine.  The public
surface mirrors the reference's first-class citizens
(``/root/reference/marie/__init__.py:160-183``): ``Document``,
``DocumentArray``, ``Client``, ``Deployment``, ``Flow``, ``Executor``,
``requests``, ``dynamic_batching``, ``monitor``.

Heavy submodules (models, serve) are imported lazily so that
``import marie_tpu`` stays fast and does not pull in JAX until compute is
actually requested.
"""

import os as _os

__version__ = "0.1.0"
__proto_version__ = "0.1.0"

# Keep JAX from grabbing all host memory for its CPU client in tests.
_os.environ.setdefault("XLA_PYTHON_CLIENT_PREALLOCATE", "false")


def _lazy(name, attr):
    import importlib

    mod = importlib.import_module(name)
    return getattr(mod, attr)


_LAZY_ATTRS = {
    # doc types (reference: marie/_docarray.py, marie/api/docs.py)
    "Document": ("marie_tpu.types.docs", "Document"),
    "DocumentArray": ("marie_tpu.types.docs", "DocumentArray"),
    "AssetKeyDoc": ("marie_tpu.api.docs", "AssetKeyDoc"),
    "StorageDoc": ("marie_tpu.api.docs", "StorageDoc"),
    "MarieDoc": ("marie_tpu.api.docs", "MarieDoc"),
    # executor surface (reference: marie/serve/executors/__init__.py:334)
    "Executor": ("marie_tpu.serve.executors", "BaseExecutor"),
    "BaseExecutor": ("marie_tpu.serve.executors", "BaseExecutor"),
    "requests": ("marie_tpu.serve.executors.decorators", "requests"),
    "write": ("marie_tpu.serve.executors.decorators", "write"),
    "dynamic_batching": ("marie_tpu.serve.executors.decorators", "dynamic_batching"),
    "monitor": ("marie_tpu.serve.executors.decorators", "monitor"),
    "safely_encoded": ("marie_tpu.serve.executors.decorators", "safely_encoded"),
    # orchestration (reference: marie/orchestrate/)
    "Deployment": ("marie_tpu.orchestrate.deployments", "Deployment"),
    "Flow": ("marie_tpu.orchestrate.flow", "Flow"),
    # client (reference: marie/clients/__init__.py)
    "Client": ("marie_tpu.clients", "Client"),
    # gateway handler (reference re-exports Gateway)
    "Gateway": ("marie_tpu.serve.runtimes.gateway.request_handling", "GatewayRequestHandler"),
}

__all__ = list(_LAZY_ATTRS) + ["__version__"]


def __getattr__(name):
    if name in _LAZY_ATTRS:
        mod, attr = _LAZY_ATTRS[name]
        val = _lazy(mod, attr)
        globals()[name] = val
        return val
    raise AttributeError(f"module 'marie_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(set(list(globals()) + __all__))
