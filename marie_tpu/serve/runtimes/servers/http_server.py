"""HTTP server (aiohttp) — REST data plane.

Route parity with the reference's FastAPI gateway apps
(``/root/reference/marie/serve/runtimes/gateway/http_fastapi_app.py``):
``POST /post`` with ``{"execEndpoint", "data", "parameters", "targetExecutor"}``,
``GET /`` and ``/health`` + ``/dry_run`` probes, ``/status`` info.
FastAPI/uvicorn are not available in this environment; aiohttp provides
the same surface.
"""

import json
from typing import Optional

from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.docs import DocumentArray
from marie_tpu.types.request import DataRequest
from marie_tpu.types.request import ts_iso as _ts_iso

# liveness/readiness probes + metrics scrape stay open so orchestrators
# and prometheus can see status (the reference serves metrics unguarded
# on a dedicated port_monitoring)
_OPEN_PATHS = {"/", "/health", "/health/status", "/dry_run", "/metrics", "/ping"}


def make_auth_middleware():
    """aiohttp middleware enforcing ``Authorization: Bearer <key>`` on
    every non-probe route whenever API keys are configured (reference:
    TokenBearer guard on the FastAPI apps, marie/auth/auth_bearer.py:11)."""
    from aiohttp import web

    @web.middleware
    async def auth_middleware(request, handler):
        from marie_tpu.auth import auth_enabled, validate_bearer

        if auth_enabled() and request.path not in _OPEN_PATHS:
            if not validate_bearer(request.headers.get("Authorization")):
                return web.json_response(
                    {"error": "missing or invalid API key"}, status=401
                )
        return await handler(request)

    return auth_middleware


class HTTPServer:
    def __init__(
        self,
        req_handler,
        port: Optional[int] = None,
        host: Optional[str] = None,
        name: str = "http",
        extra_routes=None,
        cors: bool = False,
        **kwargs,
    ):
        from marie_tpu.helper import default_bind_host, random_port

        self.req_handler = req_handler
        self.port = port or random_port()
        self.host = host or default_bind_host()
        self.logger = MarieLogger(f"HTTPServer/{name}")
        self._runner = None
        self._extra_routes = extra_routes or []
        self.cors = cors
        self.name = name

    async def dispatch_payload(self, body: dict):
        """``/post``-schema dict -> handler -> json response (shared by
        the cloud app variants, servers/cloud_http.py)."""
        from aiohttp import web

        endpoint = body.get("execEndpoint", body.get("exec_endpoint", "/"))
        docs_raw = body.get("data", [])
        req = DataRequest.from_docs(
            DocumentArray.from_dict(docs_raw) if docs_raw else DocumentArray(),
            endpoint=endpoint,
            parameters=body.get("parameters") or {},
            target_executor=body.get("targetExecutor", "") or "",
        )
        resp = await self.req_handler.process_data([req])
        payload = {
            "header": {
                "requestId": resp.request_id,
                "execEndpoint": resp.exec_endpoint,
                "status": _status_dict(resp),
            },
            "parameters": resp.parameters,
            "routes": [
                {"executor": r.executor, "startTime": _ts_iso(r.start_time),
                 "endTime": _ts_iso(r.end_time)}
                for r in resp.routes
            ],
            "data": resp.docs.to_dict(),
        }
        code = 500 if resp.is_error() else 200
        return web.json_response(payload, status=code)

    async def setup_server(self) -> None:
        from aiohttp import web

        app = web.Application(
            client_max_size=64 * 1024 * 1024,
            middlewares=[make_auth_middleware()],
        )

        async def index(request):
            return web.json_response({"ok": True})

        async def health(request):
            return web.json_response({"status": "OK"})

        async def dry_run(request):
            try:
                if hasattr(self.req_handler, "dry_run"):
                    await self.req_handler.dry_run()
                return web.json_response({"code": 0, "description": ""})
            except Exception as ex:  # noqa: BLE001
                return web.json_response(
                    {"code": 1, "description": repr(ex)}, status=500
                )

        async def status(request):
            return web.json_response({"jina": self.req_handler.info(), "envs": {}})

        async def post(request):
            try:
                body = await request.json()
            except json.JSONDecodeError:
                return web.json_response(
                    {"error": "invalid JSON body"}, status=400
                )
            return await self.dispatch_payload(body)

        async def post_stream(request):
            """NDJSON streaming of one-doc-in/N-docs-out requests: each
            produced document flushes as its own line the moment the
            (generator) endpoint yields it — the HTTP face of the gRPC
            ``stream_doc`` contract (reference generator endpoints,
            request_handling.py:1027)."""
            handler_stream = getattr(
                self.req_handler, "process_single_doc_stream", None
            )
            if handler_stream is None:
                return web.json_response(
                    {"error": "streaming unsupported by this runtime"},
                    status=501,
                )
            try:
                body = await request.json()
            except json.JSONDecodeError:
                return web.json_response(
                    {"error": "invalid JSON body"}, status=400
                )
            endpoint = body.get("execEndpoint", body.get("exec_endpoint", "/"))
            docs_raw = body.get("data", [])
            req = DataRequest.from_docs(
                DocumentArray.from_dict(docs_raw) if docs_raw else DocumentArray(),
                endpoint=endpoint,
                parameters=body.get("parameters") or {},
            )
            resp = web.StreamResponse(
                headers={"Content-Type": "application/x-ndjson"}
            )
            await resp.prepare(request)
            try:
                async for doc in handler_stream(req):
                    await resp.write(
                        (json.dumps(doc.to_dict()) + "\n").encode()
                    )
            except Exception as ex:  # noqa: BLE001 — stream the error line
                await resp.write(
                    (json.dumps({"error": repr(ex)}) + "\n").encode()
                )
            await resp.write_eof()
            return resp

        async def endpoints(request):
            import inspect

            eps = self.req_handler.endpoints()
            if inspect.isawaitable(eps):
                eps = await eps
            return web.json_response(eps)

        async def metrics(request):
            from marie_tpu.metrics import render_prometheus

            return web.Response(
                text=render_prometheus(),
                content_type="text/plain",
                charset="utf-8",
            )

        async def openapi(request):
            return web.json_response(await self._openapi_spec())

        app.router.add_get("/", index)
        app.router.add_get("/health", health)
        app.router.add_get("/dry_run", dry_run)
        app.router.add_get("/status", status)
        app.router.add_get("/endpoints", endpoints)
        app.router.add_get("/metrics", metrics)
        app.router.add_get("/openapi.json", openapi)
        app.router.add_post("/post", post)
        app.router.add_post("/post_stream", post_stream)
        for route in self._extra_routes:
            app.router.add_route(route["method"], route["path"], route["handler"])

        if self.cors:
            # CORS for browser frontends (reference `cors` gateway flag,
            # http_fastapi_app.py:73 — allow-all, matching its defaults)
            @web.middleware
            async def cors_middleware(request, handler):
                if request.method == "OPTIONS":
                    resp = web.Response(status=204)
                else:
                    resp = await handler(request)
                resp.headers["Access-Control-Allow-Origin"] = "*"
                resp.headers["Access-Control-Allow-Methods"] = "*"
                resp.headers["Access-Control-Allow-Headers"] = "*"
                return resp

            app.middlewares.append(cors_middleware)
            # aiohttp routes 405 OPTIONS before middlewares unless a route
            # exists; add catch-all preflight
            async def preflight(request):
                return web.Response(status=204)

            app.router.add_route("OPTIONS", "/{tail:.*}", preflight)

        self._runner = web.AppRunner(app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, self.host, self.port)
        await site.start()
        self.logger.debug(f"HTTP server serving on {self.host}:{self.port}")

    async def _openapi_spec(self) -> dict:
        """OpenAPI 3 document for the REST surface (the reference's
        FastAPI gateway serves this automatically; here it is built from
        the live endpoint discovery so execEndpoint enumerates the real
        exec endpoints)."""
        import inspect

        eps = self.req_handler.endpoints()
        if inspect.isawaitable(eps):
            eps = await eps
        exec_endpoints = sorted(eps.get("endpoints", []))
        doc_schema = {
            "type": "object",
            "properties": {
                "id": {"type": "string"},
                "text": {"type": "string"},
                "uri": {"type": "string"},
                "tags": {"type": "object"},
                "tensor": {"description": "nested list / base64 ndarray"},
            },
        }
        data_request = {
            "type": "object",
            "properties": {
                "execEndpoint": {
                    "type": "string",
                    "enum": exec_endpoints or None,
                },
                "data": {"type": "array", "items": doc_schema},
                "parameters": {"type": "object"},
                "targetExecutor": {
                    "type": "string",
                    "description": "regex over executor names",
                },
            },
            "required": ["execEndpoint"],
        }
        if not exec_endpoints:
            data_request["properties"]["execEndpoint"].pop("enum")
        response = {
            "type": "object",
            "properties": {
                "header": {"type": "object"},
                "parameters": {"type": "object"},
                "routes": {"type": "array"},
                "data": {"type": "array", "items": doc_schema},
            },
        }
        json_of = lambda schema: {  # noqa: E731
            "content": {"application/json": {"schema": schema}}
        }
        return {
            "openapi": "3.0.3",
            "info": {"title": f"marie-tpu {self.name}", "version": "1"},
            "paths": {
                "/post": {
                    "post": {
                        "summary": "process documents through the flow",
                        "requestBody": json_of(data_request),
                        "responses": {"200": {"description": "ok",
                                              **json_of(response)}},
                    }
                },
                "/post_stream": {
                    "post": {
                        "summary": "NDJSON document streaming",
                        "requestBody": json_of(data_request),
                        "responses": {"200": {"description": "ndjson lines"}},
                    }
                },
                "/dry_run": {"get": {"summary": "flow readiness probe",
                                     "responses": {"200": {"description": "ready"}}}},
                "/status": {"get": {"summary": "runtime info",
                                    "responses": {"200": {"description": "info"}}}},
                "/endpoints": {"get": {"summary": "exec endpoint discovery",
                                       "responses": {"200": {"description": "endpoints"}}}},
                "/metrics": {"get": {"summary": "prometheus exposition",
                                     "responses": {"200": {"description": "text"}}}},
                "/health": {"get": {"summary": "liveness",
                                    "responses": {"200": {"description": "ok"}}}},
            },
        }

    async def run_server(self) -> None:
        import asyncio

        while True:  # aiohttp runs inside the loop; park forever
            await asyncio.sleep(3600)

    async def shutdown(self) -> None:
        # the runtime owns the handler's lifecycle; servers only stop transport
        if self._runner is not None:
            await self._runner.cleanup()

    @property
    def address(self) -> str:
        host = "127.0.0.1" if self.host == "0.0.0.0" else self.host
        return f"http://{host}:{self.port}"


def _status_dict(resp: DataRequest) -> dict:
    st = resp.proto.header.status
    out = {"code": int(st.code), "description": st.description}
    if st.exception.name:
        out["exception"] = {
            "name": st.exception.name,
            "args": list(st.exception.args),
            "stacks": list(st.exception.stacks),
            "executor": st.exception.executor,
        }
    return out
