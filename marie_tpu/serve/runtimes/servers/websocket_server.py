"""WebSocket server (reference:
``/root/reference/marie/serve/runtimes/servers/websocket.py:10`` — the
streaming JSON protocol of the websocket gateway).

Each incoming JSON message is one request (same shape as HTTP ``/post``);
responses stream back on the same socket in completion order.
"""

import asyncio
import json
from typing import Optional

from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.docs import DocumentArray
from marie_tpu.types.request import DataRequest


class WebSocketServer:
    def __init__(
        self,
        req_handler,
        port: Optional[int] = None,
        host: Optional[str] = None,
        name: str = "websocket",
        **kwargs,
    ):
        from marie_tpu.helper import default_bind_host, random_port

        self.req_handler = req_handler
        self.port = port or random_port()
        self.host = host or default_bind_host()
        self.logger = MarieLogger(f"WebSocketServer/{name}")
        self._runner = None

    async def setup_server(self) -> None:
        from aiohttp import WSMsgType, web

        async def ws_handler(request):
            from marie_tpu.auth import auth_enabled, validate_bearer

            if auth_enabled() and not validate_bearer(
                request.headers.get("Authorization")
            ):
                return web.json_response(
                    {"error": "missing or invalid API key"}, status=401
                )
            ws = web.WebSocketResponse(max_msg_size=64 * 1024 * 1024)
            await ws.prepare(request)
            pending = set()

            async def process(body):
                req = DataRequest.from_docs(
                    DocumentArray.from_dict(body.get("data", [])),
                    endpoint=body.get("execEndpoint", "/"),
                    parameters=body.get("parameters") or {},
                    target_executor=body.get("targetExecutor", "") or "",
                )
                # echo the client's requestId so a streaming client can
                # match completion-order responses back to its requests
                client_rid = (body.get("header") or {}).get("requestId")
                if client_rid:
                    req.request_id = str(client_rid)
                handler_stream = getattr(
                    self.req_handler, "process_single_doc_stream", None
                )
                if body.get("stream") and handler_stream is not None:
                    # generator-endpoint doc streaming: one message per
                    # produced document + a done marker (the WS face of
                    # gRPC stream_doc / HTTP NDJSON /post_stream)
                    try:
                        async for doc in handler_stream(req):
                            await ws.send_json(
                                {
                                    "header": {"requestId": req.request_id},
                                    "doc": doc.to_dict(),
                                }
                            )
                        await ws.send_json(
                            {
                                "header": {"requestId": req.request_id},
                                "done": True,
                            }
                        )
                    except Exception as ex:  # noqa: BLE001
                        await ws.send_json(
                            {
                                "header": {"requestId": req.request_id},
                                "error": repr(ex),
                                "done": True,
                            }
                        )
                    return
                resp = await self.req_handler.process_data([req])
                await ws.send_json(
                    {
                        "header": {
                            "requestId": resp.request_id,
                            "status": {
                                "code": int(resp.proto.header.status.code),
                                "description": resp.proto.header.status.description,
                            },
                        },
                        "data": resp.docs.to_dict(),
                        "parameters": resp.parameters,
                    }
                )

            async for msg in ws:
                if msg.type == WSMsgType.TEXT:
                    try:
                        body = json.loads(msg.data)
                    except json.JSONDecodeError:
                        await ws.send_json({"error": "invalid JSON"})
                        continue
                    task = asyncio.create_task(process(body))
                    pending.add(task)
                    task.add_done_callback(pending.discard)
                elif msg.type == WSMsgType.ERROR:
                    break
            for task in pending:
                task.cancel()
            return ws

        app = web.Application()
        app.router.add_get("/", ws_handler)
        app.router.add_get("/ws", ws_handler)
        self._runner = web.AppRunner(app)
        await self._runner.setup()
        site = web.TCPSite(self._runner, self.host, self.port)
        await site.start()
        self.logger.debug(f"websocket server on {self.host}:{self.port}")

    async def run_server(self) -> None:
        while True:
            await asyncio.sleep(3600)

    async def shutdown(self) -> None:
        if self._runner is not None:
            await self._runner.cleanup()

    @property
    def address(self) -> str:
        host = "127.0.0.1" if self.host == "0.0.0.0" else self.host
        return f"ws://{host}:{self.port}"
