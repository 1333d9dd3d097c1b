"""Pod — one serving process.

Parity with the reference (``/root/reference/marie/orchestrate/pods/__init__.py:268``
+ ``serve/executors/run.py:74``): ``Pod.start`` forks a child process that
builds the request handler + runtime and serves until terminated; the
parent waits on a readiness event.
"""

import multiprocessing
import os
import pickle
import time
from typing import Any, Dict, Optional

from marie_tpu.excepts import RuntimeFailToStart
from marie_tpu.logging_core import MarieLogger


def _pod_main(kind: str, kwargs: Dict[str, Any], ready_event, port_value) -> None:
    """Child-process entrypoint (reference run.py:74 run())."""
    import asyncio

    if os.environ.get("JAX_PLATFORMS"):
        # honour the parent's platform choice even where a sitecustomize
        # pre-imports jax with an accelerator plugin before env vars are
        # consulted (the CPU-test path must never touch the accelerator:
        # a busy chip turns executor model-load into a startup timeout)
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from marie_tpu.serve.runtimes.asyncio_runtime import AsyncNewLoopRuntime

    if kwargs.get("auth_keys"):
        # spawned pods start with a fresh APIKeyManager — re-load the
        # parent's configured keys so the whole flow enforces auth
        from marie_tpu.auth import APIKeyManager

        APIKeyManager.from_config(kwargs["auth_keys"])

    if kind == "worker":
        from marie_tpu.serve.runtimes.worker.request_handling import (
            WorkerRequestHandler,
        )

        handler = WorkerRequestHandler(
            uses=kwargs.get("uses"),
            uses_with=kwargs.get("uses_with"),
            name=kwargs.get("name", "executor"),
            workspace=kwargs.get("workspace"),
        )
        if kwargs.get("raft"):
            # stateful replicated executor: writes replicate through RAFT
            # (reference run_stateful/run_raft, serve/executors/run.py:16,173)
            from marie_tpu.serve.consensus.stateful import (
                StatefulReplicatedHandler,
            )

            handler = StatefulReplicatedHandler(
                handler,
                node_id=kwargs["raft"]["node_id"],
                bind_addr=kwargs["raft"]["bind_addr"],
                peers=kwargs["raft"].get("peers", []),
            )
    elif kind == "gateway":
        from marie_tpu.serve.runtimes.gateway.request_handling import (
            GatewayRequestHandler,
        )

        handler = GatewayRequestHandler(
            graph_representation=kwargs["graph_representation"],
            executor_addresses=kwargs["executor_addresses"],
            prefetch=kwargs.get("prefetch", 0),
            floating_deployments=kwargs.get("floating_deployments"),
            node_conditions=kwargs.get("node_conditions"),
            name=kwargs.get("name", "gateway"),
        )
    elif kind == "head":
        from marie_tpu.enums import PollingType
        from marie_tpu.serve.runtimes.head.request_handling import (
            HeaderRequestHandler,
        )

        raw_polling = kwargs.get("polling", "all")
        handler = HeaderRequestHandler(
            shard_addresses=kwargs["shard_addresses"],
            polling=raw_polling
            if isinstance(raw_polling, dict)
            else PollingType(str(raw_polling).lower()),
            name=kwargs.get("name", "head"),
        )
    else:
        raise ValueError(f"unknown pod kind {kind}")

    runtime = AsyncNewLoopRuntime(
        handler,
        protocol=kwargs.get("protocol", "grpc"),
        protocols=kwargs.get("protocols"),
        ports=kwargs.get("ports"),
        port=kwargs.get("port"),
        host=kwargs.get("bind_host"),
        name=kwargs.get("name", kind),
        port_monitoring=kwargs.get("port_monitoring"),
    )

    async def _serve():
        # SIGTERM/SIGINT become a graceful stop; handlers install BEFORE
        # readiness is signalled so a terminate() racing startup still
        # takes the graceful path (deregistration + server shutdown +
        # executor close always run — reference runtime signal handling,
        # serve/runtimes/asyncio.py)
        import signal

        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                loop.add_signal_handler(sig, stop.set)
            except (NotImplementedError, RuntimeError):
                pass

        await runtime.server.setup_server()
        if runtime.port_monitoring:
            await runtime._start_monitoring()
        # publish the actually-bound port, then signal readiness
        srv = runtime.server
        port_value.value = getattr(srv, "port", 0) or getattr(
            srv, "servers", [None]
        )[0].port
        # self-register with discovery (reference: workers hold etcd leases)
        discovery_client = None
        discovery_key = None
        if kwargs.get("discovery_address"):
            import json

            from marie_tpu.serve.discovery import DiscoveryClient

            discovery_client = DiscoveryClient(kwargs["discovery_address"])
            deployment = kwargs.get("deployment", kwargs.get("name", kind))
            discovery_key = f"gateway/{deployment}/{kwargs.get('name', kind)}"
            await discovery_client.register(
                discovery_key,
                json.dumps({"address": f"127.0.0.1:{port_value.value}"}),
                ttl=6.0,
            )
        ready_event.set()
        try:
            serve_task = asyncio.create_task(runtime.server.run_server())
            stop_task = asyncio.create_task(stop.wait())
            done, pending = await asyncio.wait(
                [serve_task, stop_task], return_when=asyncio.FIRST_COMPLETED
            )
            for t in pending:
                t.cancel()
            # let cancellation finish before tearing the server down —
            # a half-cancelled wait_for_termination corrupts grpc's stop
            await asyncio.gather(*pending, return_exceptions=True)
            if serve_task in done:
                serve_task.result()  # surface server crashes
        finally:
            if discovery_client is not None:
                # graceful shutdown DEREGISTERS immediately so the
                # gateway reroutes now instead of after lease expiry
                # (crash paths still rely on the TTL reaper)
                try:
                    await discovery_client.delete(discovery_key)
                except Exception:  # noqa: BLE001 — registry may be gone
                    pass
                await discovery_client.close()
            try:
                await runtime.server.shutdown()
            except (Exception, asyncio.CancelledError):  # noqa: BLE001 —
                # teardown must not mask a clean exit: cancelling the
                # grpc wait_for_termination task cancels grpc's shared
                # shutdown future, so stop() re-raises CancelledError
                pass
            if hasattr(handler, "close"):
                await handler.close()

    try:
        asyncio.run(_serve())
    except (KeyboardInterrupt, SystemExit):
        pass


class Pod:
    def __init__(self, kind: str, **kwargs):
        from marie_tpu.auth import APIKeyManager

        if APIKeyManager.enabled() and not kwargs.get("auth_keys"):
            kwargs["auth_keys"] = [
                {"name": info["name"], "api_key": key,
                 "enabled": info["enabled"], "roles": info["roles"]}
                for key, info in APIKeyManager._keys.items()
            ]
        self.kind = kind
        self.kwargs = kwargs
        self.name = kwargs.get("name", kind)
        self.logger = MarieLogger(f"pod/{self.name}")
        ctx = multiprocessing.get_context("spawn")
        self._ready = ctx.Event()
        self._port = ctx.Value("i", kwargs.get("port") or 0)
        self._process = ctx.Process(
            target=_pod_main,
            args=(kind, kwargs, self._ready, self._port),
            daemon=True,
            name=f"marie-pod-{self.name}",
        )

    def start(self, timeout: float = 60.0) -> "Pod":
        self._process.start()
        deadline = time.time() + timeout
        while not self._ready.wait(0.2):
            if not self._process.is_alive():
                raise RuntimeFailToStart(
                    f"pod {self.name} died during startup "
                    f"(exitcode={self._process.exitcode}); check that the "
                    f"executor module is importable in subprocesses"
                )
            if time.time() > deadline:
                self.close()
                raise RuntimeFailToStart(
                    f"pod {self.name} did not become ready within {timeout}s"
                )
        return self

    @property
    def port(self) -> int:
        return self._port.value

    @property
    def address(self) -> str:
        return f"127.0.0.1:{self.port}"

    def is_alive(self) -> bool:
        return self._process.is_alive()

    def close(self, timeout: float = 10.0) -> None:
        if self._process.is_alive():
            self._process.terminate()
            self._process.join(timeout)
            if self._process.is_alive():
                self._process.kill()
                self._process.join(5)

    def __enter__(self) -> "Pod":
        return self.start()

    def __exit__(self, *args) -> None:
        self.close()
