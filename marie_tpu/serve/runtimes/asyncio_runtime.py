"""AsyncNewLoopRuntime — one asyncio loop per serving process.

Parity with the reference (``/root/reference/marie/serve/runtimes/asyncio.py:33``):
builds the protocol server for a request handler, runs it until
SIGINT/SIGTERM or programmatic cancellation, tears down cleanly.
"""

import asyncio
import signal
import threading
from typing import Optional

from marie_tpu.logging_core import MarieLogger


class AsyncNewLoopRuntime:
    def __init__(
        self,
        req_handler,
        protocol: str = "grpc",
        port: Optional[int] = None,
        host: Optional[str] = None,
        name: str = "runtime",
        protocols=None,
        ports=None,
        port_monitoring: Optional[int] = None,
    ):
        self.logger = MarieLogger(f"runtime/{name}")
        self.req_handler = req_handler
        self.name = name
        self._cancel_event: Optional[asyncio.Event] = None
        self.port_monitoring = port_monitoring
        self._monitoring_runner = None
        self.server = self._build_server(
            protocol, port, host, name, protocols, ports
        )

    def _build_server(self, protocol, port, host, name, protocols, ports):
        from marie_tpu.serve.runtimes.servers import (
            CompositeServer,
            GRPCServer,
            HTTPServer,
            WebSocketServer,
        )

        if protocols and len(protocols) > 1:
            return CompositeServer(
                self.req_handler, protocols=protocols, ports=ports, host=host,
                name=name,
            )
        proto = (protocols[0] if protocols else protocol).lower()
        cls = {
            "grpc": GRPCServer, "http": HTTPServer,
            "websocket": WebSocketServer,
        }.get(proto)
        if cls is None and proto in ("sagemaker", "azure"):
            from marie_tpu.serve.runtimes.servers.cloud_http import (
                AzureHTTPServer,
                SagemakerHTTPServer,
            )

            cls = {"sagemaker": SagemakerHTTPServer,
                   "azure": AzureHTTPServer}[proto]
        if cls is None:
            raise ValueError(f"unknown protocol {proto!r}")
        return cls(self.req_handler, port=port, host=host, name=name)

    # ------------------------------------------------------------------
    async def _start_monitoring(self) -> None:
        """Prometheus scrape endpoint on a dedicated port (reference
        MonitoringMixin, marie/serve/runtimes/monitoring.py — the per-
        runtime ``port_monitoring``). Any protocol runtime gets one."""
        from aiohttp import web

        from marie_tpu.helper import default_bind_host
        from marie_tpu.metrics import render_prometheus

        async def metrics(request):
            return web.Response(
                text=render_prometheus(),
                content_type="text/plain",
                charset="utf-8",
            )

        app = web.Application()
        app.router.add_get("/metrics", metrics)
        self._monitoring_runner = web.AppRunner(app)
        await self._monitoring_runner.setup()
        site = web.TCPSite(
            self._monitoring_runner, default_bind_host(), self.port_monitoring
        )
        await site.start()
        self.logger.debug(f"metrics on :{self.port_monitoring}/metrics")

    async def _serve(self) -> None:
        self._cancel_event = asyncio.Event()
        await self.server.setup_server()
        if self.port_monitoring:
            await self._start_monitoring()

        loop = asyncio.get_running_loop()
        if threading.current_thread() is threading.main_thread():
            for sig in (signal.SIGINT, signal.SIGTERM):
                try:
                    loop.add_signal_handler(sig, self._cancel_event.set)
                except (NotImplementedError, RuntimeError):
                    pass

        run_task = asyncio.create_task(self.server.run_server())
        cancel_task = asyncio.create_task(self._cancel_event.wait())
        try:
            await asyncio.wait(
                [run_task, cancel_task], return_when=asyncio.FIRST_COMPLETED
            )
        finally:
            run_task.cancel()
            cancel_task.cancel()
            await self.server.shutdown()
            if self._monitoring_runner is not None:
                await self._monitoring_runner.cleanup()
            if hasattr(self.req_handler, "close"):
                await self.req_handler.close()

    def run_forever(self) -> None:
        asyncio.run(self._serve())

    def cancel(self) -> None:
        if self._cancel_event is not None:
            self._cancel_event.set()
