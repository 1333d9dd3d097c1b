"""HTTP client over the aiohttp REST surface."""

from typing import Any, Dict, List, Optional, Union

from marie_tpu.excepts import BadServer
from marie_tpu.helper import run_async
from marie_tpu.types.docs import Document, DocumentArray


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
    ):
        import aiohttp

        docs = inputs if isinstance(inputs, DocumentArray) else DocumentArray(inputs or [])
        payload = {
            "execEndpoint": on,
            "data": docs.to_dict(),
            "parameters": parameters or {},
            "targetExecutor": target_executor,
        }
        async with aiohttp.ClientSession(headers=self._headers) as session:
            async with session.post(
                f"{self.base}/post", json=payload,
                timeout=aiohttp.ClientTimeout(total=timeout),
            ) as resp:
                body = await resp.json()
                if resp.status >= 400:
                    status = body.get("header", {}).get("status", {})
                    raise BadServer(
                        status.get("description") or f"HTTP {resp.status}"
                    )
        result = DocumentArray.from_dict(body.get("data", []))
        return body if return_responses else result

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
