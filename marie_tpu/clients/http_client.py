"""HTTP client over the aiohttp REST surface.

Same client surface as the gRPC/WebSocket clients (reference
``Client.post`` semantics, ``/root/reference/marie/clients/base/http.py``):
``request_size`` chunking, retry with exponential backoff on transient
failures (connect errors, 502/503/504), and per-request
``on_done``/``on_error``/``on_always`` callbacks with
``continue_on_error``.
"""

import asyncio
from typing import Any, Dict, List, Optional, Union

from marie_tpu.excepts import BadServer
from marie_tpu.helper import run_async
from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.docs import Document, DocumentArray

_TRANSIENT_HTTP = (502, 503, 504)


class HTTPClient:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: Optional[int] = None,
        api_key: Optional[str] = None,
        **kwargs,
    ):
        if port is None:
            raise ValueError("port is required")
        scheme = "http://" if not host.startswith("http") else ""
        self.base = f"{scheme}{host}:{port}"
        self.logger = MarieLogger("HTTPClient")
        self._headers = (
            {"Authorization": f"Bearer {api_key}"} if api_key else {}
        )

    async def apost(
        self,
        on: str = "/",
        inputs: Union[DocumentArray, List[Document], None] = None,
        parameters: Optional[Dict[str, Any]] = None,
        target_executor: str = "",
        timeout: Optional[float] = None,
        return_responses: bool = False,
        request_size: int = 0,
        max_attempts: int = 1,
        initial_backoff: float = 0.1,
        max_backoff: float = 2.0,
        backoff_multiplier: float = 1.5,
        on_done=None,
        on_error=None,
        on_always=None,
        continue_on_error: bool = False,
    ):
        """Post docs to an endpoint.  ``request_size`` > 0 chunks inputs
        into that many docs per HTTP request; transient failures
        (connection errors, 502/503/504) retry up to ``max_attempts``
        with exponential backoff.  Callbacks receive the parsed response
        body (dict): ``on_done(body)`` per successful request,
        ``on_error(body)`` per failed one (suppresses the raise, like
        ``continue_on_error``), ``on_always(body)`` after each."""
        import aiohttp

        from marie_tpu.clients.helper import as_docarray, chunk_docs

        chunks = chunk_docs(as_docarray(inputs), request_size)
        bodies: List[dict] = []
        async with aiohttp.ClientSession(headers=self._headers) as session:
            for chunk in chunks:
                payload = {
                    "execEndpoint": on,
                    "data": chunk.to_dict(),
                    "parameters": parameters or {},
                    "targetExecutor": target_executor,
                }
                backoff = initial_backoff
                attempt = 0
                while True:
                    attempt += 1
                    try:
                        async with session.post(
                            f"{self.base}/post", json=payload,
                            timeout=aiohttp.ClientTimeout(total=timeout),
                        ) as resp:
                            status = resp.status
                            body = await resp.json(content_type=None)
                        if status in _TRANSIENT_HTTP and attempt < max_attempts:
                            raise aiohttp.ClientError(f"HTTP {status}")
                        break
                    except (aiohttp.ClientError, asyncio.TimeoutError) as ex:
                        if attempt >= max_attempts:
                            raise
                        self.logger.warning(
                            f"retrying after {ex!r} "
                            f"(attempt {attempt}/{max_attempts})"
                        )
                        await asyncio.sleep(backoff)
                        backoff = min(backoff * backoff_multiplier, max_backoff)
                if status >= 400:
                    if on_error is not None:
                        on_error(body)
                    elif not continue_on_error:
                        st = (body or {}).get("header", {}).get("status", {})
                        raise BadServer(
                            st.get("description") or f"HTTP {status}"
                        )
                elif on_done is not None:
                    on_done(body)
                if on_always is not None:
                    on_always(body)
                bodies.append(body or {})
        if return_responses:
            return bodies if len(bodies) > 1 else bodies[0]
        out = DocumentArray()
        for body in bodies:
            for d in DocumentArray.from_dict(body.get("data", []) or []):
                out.append(d)
        return out

    async def adry_run(self, timeout: float = 5.0) -> bool:
        import aiohttp

        async with aiohttp.ClientSession() as session:
            async with session.get(
                f"{self.base}/dry_run",
                timeout=aiohttp.ClientTimeout(total=timeout),
            ) as resp:
                return resp.status == 200

    def post(self, on: str = "/", inputs=None, **kwargs):
        return run_async(self.apost(on=on, inputs=inputs, **kwargs))

    def dry_run(self, **kwargs) -> bool:
        return run_async(self.adry_run(**kwargs))
