"""Sagemaker/Azure HTTP app variants (reference servers/http.py:265,302):
/ping health, /invocations (+/score) with JSON and no-header CSV bodies."""

import asyncio

import aiohttp
import pytest

from marie_tpu.helper import random_port
from marie_tpu.serve.runtimes.servers.cloud_http import (
    AzureHTTPServer,
    SagemakerHTTPServer,
)
from marie_tpu.serve.runtimes.worker.request_handling import (
    WorkerRequestHandler,
)
from tests.integration.executors import EchoExecutor


@pytest.mark.parametrize("server_cls", [SagemakerHTTPServer, AzureHTTPServer])
def test_cloud_app_contract(server_cls):
    async def drive():
        handler = WorkerRequestHandler(uses=EchoExecutor, name="cloud-echo")
        server = server_cls(handler, port=random_port())
        await server.setup_server()
        base = f"http://127.0.0.1:{server.port}"
        try:
            async with aiohttp.ClientSession() as s:
                async with s.get(f"{base}/ping") as r:
                    assert r.status == 200

                # JSON body, endpoint named via header
                async with s.post(
                    f"{base}/invocations",
                    json=[{"text": "hello"}],
                    headers={"X-Marie-Endpoint": "/echo"},
                ) as r:
                    assert r.status == 200
                    body = await r.json()
                    assert body["data"][0]["text"] == "echo:hello"

                # no-header CSV body (the reference CSP contract)
                async with s.post(
                    f"{base}/invocations",
                    data="alpha,k=v\nbeta",
                    headers={
                        "Content-Type": "text/csv",
                        "X-Marie-Endpoint": "/echo",
                    },
                ) as r:
                    assert r.status == 200
                    body = await r.json()
                    texts = [d["text"] for d in body["data"]]
                    assert texts == ["echo:alpha", "echo:beta"]
                    assert body["data"][0]["tags"]["k"] == "v"

                if isinstance(server, AzureHTTPServer):
                    async with s.post(
                        f"{base}/score",
                        json={"data": [{"text": "az"}],
                              "execEndpoint": "/echo"},
                    ) as r:
                        assert r.status == 200
                        body = await r.json()
                        assert body["data"][0]["text"] == "echo:az"
        finally:
            await server.shutdown()

    asyncio.run(drive())
