"""BaseExecutor — YAML-constructible, endpoint-registered serving unit.

Parity with the reference (``/root/reference/marie/serve/executors/__init__.py:334``):
metaclass-collected ``@requests`` endpoints, ``requests`` mapping override
from YAML/args, sync+async endpoint dispatch, workspace, snapshot/restore
hooks, and a ``.serve()`` classmethod.  The ML payload inside executors is
JAX; one executor process drives one TPU chip (the TPU analog of the
reference's one-GPU-per-replica placement).
"""

import asyncio
import inspect
import os
from types import SimpleNamespace
from typing import Any, Callable, Dict, Optional, Sequence

from marie_tpu.jaml import JAMLCompatible
from marie_tpu.logging_core import MarieLogger

__all__ = ["BaseExecutor"]


class BaseExecutor(JAMLCompatible):
    def __init__(
        self,
        metas: Optional[Dict[str, Any]] = None,
        requests: Optional[Dict[str, str]] = None,
        runtime_args: Optional[Dict[str, Any]] = None,
        workspace: Optional[str] = None,
        **kwargs,
    ):
        self.metas = SimpleNamespace(**(metas or {}))
        self.runtime_args = SimpleNamespace(**(runtime_args or {}))
        self._workspace = workspace
        self.logger = MarieLogger(type(self).__name__)
        self._metrics: Dict[str, Any] = {}

        # collect @requests-decorated endpoints from the class
        self.requests: Dict[str, Callable] = {}
        for name in dir(type(self)):
            fn = getattr(type(self), name, None)
            for ep in getattr(fn, "__marie_endpoints__", []):
                self.requests[ep] = getattr(self, name)
        # YAML-level remapping: {endpoint: method_name}
        for ep, method_name in (requests or {}).items():
            self.requests[ep] = getattr(self, method_name)

        self.dynamic_batching: Dict[str, Dict[str, Any]] = {}
        for ep, fn in self.requests.items():
            cfg = getattr(fn, "__marie_dynamic_batching__", None)
            if cfg:
                self.dynamic_batching[ep] = dict(cfg)

    @property
    def write_endpoints(self) -> list:
        """Endpoints marked ``@write`` — the ones a stateful deployment
        replicates through RAFT (reference ``write_endpoints``,
        ``serve/executors/__init__.py:573``)."""
        out = []
        for ep, fn in self.requests.items():
            target = getattr(fn, "__func__", fn)
            if getattr(target, "__is_write__", False):
                out.append(ep)
        return sorted(out)

    # ------------------------------------------------------------------
    @property
    def workspace(self) -> Optional[str]:
        ws = self._workspace or getattr(self.runtime_args, "workspace", None)
        if ws:
            os.makedirs(ws, exist_ok=True)
        return ws

    @property
    def deployment_name(self) -> str:
        return getattr(self.runtime_args, "name", type(self).__name__)

    def _record_metric(self, name: str, value: float, documentation: str = "") -> None:
        try:
            from prometheus_client import Summary

            if name not in self._metrics:
                self._metrics[name] = Summary(
                    f"marie_{self.deployment_name}_{name}".replace("-", "_"),
                    documentation or name,
                )
            self._metrics[name].observe(value)
        except Exception:  # noqa: BLE001 — metrics must never break serving
            pass

    # ------------------------------------------------------------------
    def endpoint_for(self, exec_endpoint: str) -> Optional[Callable]:
        if exec_endpoint in self.requests:
            return self.requests[exec_endpoint]
        return self.requests.get("/default")

    async def __acall__(self, exec_endpoint: str, docs, parameters, **kwargs):
        """Dispatch one request to the bound endpoint (sync or async)."""
        fn = self.endpoint_for(exec_endpoint)
        if fn is None:
            raise ValueError(
                f"{type(self).__name__} has no endpoint {exec_endpoint!r} "
                f"(knows {sorted(self.requests)})"
            )
        sig = inspect.signature(fn)
        call_kwargs: Dict[str, Any] = {}
        if "docs" in sig.parameters:
            call_kwargs["docs"] = docs
        if "parameters" in sig.parameters:
            call_kwargs["parameters"] = parameters
        for k, v in kwargs.items():
            if k in sig.parameters:
                call_kwargs[k] = v
        if inspect.iscoroutinefunction(fn):
            return await fn(**call_kwargs)
        loop = asyncio.get_running_loop()
        # run sync endpoints in the default executor so the event loop
        # stays responsive while JAX computes
        return await loop.run_in_executor(None, lambda: fn(**call_kwargs))

    def is_generator_endpoint(self, exec_endpoint: str) -> bool:
        """True when the bound endpoint is a (async) generator function —
        its documents stream out one at a time through ``stream_doc``
        (reference ``__is_generator__``, request_handling.py:1052)."""
        fn = self.endpoint_for(exec_endpoint)
        target = getattr(fn, "__func__", fn)
        return bool(getattr(target, "__is_generator__", False)) or (
            inspect.isasyncgenfunction(target)
            or inspect.isgeneratorfunction(target)
        )

    async def __acall_stream__(self, exec_endpoint: str, docs, parameters):
        """Dispatch to a generator endpoint, yielding items as the
        endpoint produces them (no buffering — the incremental contract
        of the reference's stream_doc)."""
        fn = self.endpoint_for(exec_endpoint)
        if fn is None:
            raise ValueError(
                f"{type(self).__name__} has no endpoint {exec_endpoint!r} "
                f"(knows {sorted(self.requests)})"
            )
        sig = inspect.signature(fn)
        call_kwargs: Dict[str, Any] = {}
        if "docs" in sig.parameters:
            call_kwargs["docs"] = docs
        if "parameters" in sig.parameters:
            call_kwargs["parameters"] = parameters
        target = getattr(fn, "__func__", fn)
        if inspect.isasyncgenfunction(target):
            async for item in fn(**call_kwargs):
                yield item
            return
        if inspect.isgeneratorfunction(target):
            gen = fn(**call_kwargs)
            loop = asyncio.get_running_loop()
            sentinel = object()
            while True:
                # advance the sync generator off-loop so blocking JAX
                # work between yields doesn't stall the server
                item = await loop.run_in_executor(
                    None, lambda: next(gen, sentinel)
                )
                if item is sentinel:
                    return
                yield item
            return
        raise ValueError(
            f"endpoint {exec_endpoint!r} is not a generator endpoint"
        )

    # ------------------------------------------------------------------
    # snapshot / restore hooks (reference :1445, :1452)
    def snapshot(self, snapshot_file: str) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not implement snapshot"
        )

    def restore(self, snapshot_file: str) -> None:
        raise NotImplementedError(
            f"{type(self).__name__} does not implement restore"
        )

    def close(self) -> None:
        pass

    # ------------------------------------------------------------------
    @classmethod
    def serve(
        cls,
        uses_with: Optional[Dict[str, Any]] = None,
        port: Optional[int] = None,
        protocol: str = "grpc",
        **kwargs,
    ):
        """Serve this executor standalone (reference ``:1049``)."""
        from marie_tpu.orchestrate.deployments import Deployment

        dep = Deployment(
            uses=cls, uses_with=uses_with, port=port, protocol=protocol, **kwargs
        )
        with dep:
            dep.block()
