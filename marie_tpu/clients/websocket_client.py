"""WebSocket client — streams requests over one socket (reference:
``/root/reference/marie/clients/base/websocket.py`` + the websocket
gateway's JSON protocol).

Each request is one JSON message (same shape as HTTP ``/post``);
responses arrive on the same socket in COMPLETION order and are matched
back to their request by ``requestId``.
"""

import json
import uuid
from typing import Any, Dict, List, Optional, Union

from marie_tpu.excepts import BadServer
from marie_tpu.helper import run_async
from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.docs import Document, DocumentArray


class WebSocketClient:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: Optional[int] = None,
        api_key: Optional[str] = None,
        **kwargs,
    ):
        if port is None:
            raise ValueError("port is required")
        self.url = f"ws://{host}:{port}/"
        self.logger = MarieLogger("WebSocketClient")
        self._headers = (
            {"Authorization": f"Bearer {api_key}"} if api_key else {}
        )

    async def apost(
        self,
        on: str = "/",
        inputs: Union[DocumentArray, List[Document], None] = None,
        parameters: Optional[Dict[str, Any]] = None,
        target_executor: str = "",
        request_size: int = 0,
        timeout: Optional[float] = None,
        return_responses: bool = False,
        on_done=None,
        on_error=None,
        on_always=None,
        continue_on_error: bool = False,
    ):
        """Send ``inputs`` (chunked into ``request_size`` requests when
        > 0) over ONE socket; returns the concatenated response docs in
        REQUEST order (responses may complete out of order).

        Callbacks mirror the gRPC client: ``on_done(resp)`` per
        successful chunk, ``on_error(resp)`` per failed one (suppresses
        the raise, like ``continue_on_error``), ``on_always(resp)``
        after each — a failed chunk no longer abandons still-in-flight
        sibling chunks."""
        import aiohttp

        docs = _as_docarray(inputs)
        chunks = _chunk(docs, request_size)
        results: List[Optional[dict]] = [None] * len(chunks)
        ids = {}

        async with aiohttp.ClientSession() as session:
            async with session.ws_connect(
                self.url,
                headers=self._headers,
                max_msg_size=64 * 1024 * 1024,
                timeout=timeout or 60.0,
            ) as ws:
                for i, chunk in enumerate(chunks):
                    rid = uuid.uuid4().hex
                    ids[rid] = i
                    await ws.send_json(
                        {
                            "header": {"requestId": rid},
                            "execEndpoint": on,
                            "data": chunk.to_dict(),
                            "parameters": parameters or {},
                            "targetExecutor": target_executor,
                        }
                    )
                remaining = len(chunks)
                first_error: Optional[BadServer] = None
                while remaining:
                    msg = await ws.receive(timeout=timeout)
                    if msg.type != aiohttp.WSMsgType.TEXT:
                        raise BadServer(f"websocket closed early: {msg.type}")
                    body = json.loads(msg.data)
                    status = body.get("header", {}).get("status", {})
                    err = body.get("error") or (
                        status.get("description", "error")
                        if status.get("code", 0) != 0
                        else None
                    )
                    rid = body.get("header", {}).get("requestId", "")
                    slot = ids.get(rid)
                    if err is not None:
                        if slot is None:
                            # unattributable error (no requestId): cannot
                            # know which chunk failed — fatal either way
                            raise BadServer(err)
                        if on_error is not None:
                            on_error(body)
                        elif not continue_on_error:
                            first_error = first_error or BadServer(err)
                        if on_always is not None:
                            on_always(body)
                        remaining -= 1
                        continue
                    if slot is None:
                        continue  # stale/unknown response
                    results[slot] = body
                    remaining -= 1
                    if on_done is not None:
                        on_done(body)
                    if on_always is not None:
                        on_always(body)
                if first_error is not None:
                    # all in-flight chunks drained first — siblings kept
                    raise first_error

        if return_responses:
            return results
        out = DocumentArray()
        for body in results:
            if body is None:
                continue  # failed chunk under continue_on_error/on_error
            for d in DocumentArray.from_dict(body.get("data", [])):
                out.append(d)
        return out

    async def astream_doc(
        self,
        on: str,
        doc: Document,
        parameters: Optional[Dict[str, Any]] = None,
    ):
        """One document in → a stream of documents out, yielded as the
        generator endpoint produces them (the WS face of gRPC
        ``stream_doc``: a ``{"stream": true}`` message followed by one
        response message per doc and a ``done`` marker)."""
        import json as _json

        import aiohttp

        async with aiohttp.ClientSession(headers=self._headers) as session:
            async with session.ws_connect(
                self.url, max_msg_size=64 * 1024 * 1024
            ) as ws:
                await ws.send_json(
                    {
                        "execEndpoint": on,
                        "stream": True,
                        "data": [doc.to_dict()],
                        "parameters": parameters or {},
                    }
                )
                async for msg in ws:
                    body = _json.loads(msg.data)
                    if body.get("error"):
                        from marie_tpu.excepts import BadServer

                        raise BadServer(body["error"])
                    if body.get("done"):
                        return
                    yield Document.from_dict(body["doc"])

    def post(self, on: str = "/", inputs=None, **kwargs):
        return run_async(self.apost(on=on, inputs=inputs, **kwargs))


def _as_docarray(inputs) -> DocumentArray:
    if inputs is None:
        return DocumentArray()
    if isinstance(inputs, DocumentArray):
        return inputs
    da = DocumentArray()
    for d in inputs:  # list OR generator — reference accepts iterables
        da.append(d)
    return da


def _chunk(docs: DocumentArray, request_size: int) -> List[DocumentArray]:
    if request_size <= 0 or len(docs) <= request_size:
        return [docs]
    chunks = []
    cur = DocumentArray()
    for d in docs:
        cur.append(d)
        if len(cur) == request_size:
            chunks.append(cur)
            cur = DocumentArray()
    if len(cur):
        chunks.append(cur)
    return chunks
