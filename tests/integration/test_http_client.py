"""HTTPClient surface parity with the gRPC/WS clients: request_size
chunking, transient-failure retry with backoff, and
on_done/on_error/on_always callbacks (reference Client.post over HTTP,
``/root/reference/marie/clients/base/http.py``)."""

import asyncio

import pytest

from marie_tpu.clients.http_client import HTTPClient
from marie_tpu.serve.runtimes.servers.http_server import HTTPServer
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document
from tests.integration.executors import EchoExecutor


@pytest.fixture
def http_worker():
    """A REAL worker handler behind the aiohttp server, in-loop."""

    async def _start():
        handler = WorkerRequestHandler(uses=EchoExecutor, name="http-echo")
        server = HTTPServer(handler, name="t")
        await server.setup_server()
        return server

    loop = asyncio.new_event_loop()
    server = loop.run_until_complete(_start())
    try:
        yield loop, server
    finally:
        loop.run_until_complete(server.shutdown())
        loop.close()


def test_http_chunking_and_callbacks(http_worker):
    loop, server = http_worker
    client = HTTPClient(port=server.port)
    done, always = [], []
    docs = loop.run_until_complete(
        client.apost(
            "/echo",
            [Document(text=f"d{i}") for i in range(5)],
            request_size=2,
            on_done=done.append,
            on_always=always.append,
        )
    )
    assert [d.text for d in docs] == [f"echo:d{i}" for i in range(5)]
    assert len(done) == 3  # 2 + 2 + 1
    assert len(always) == 3
    # callbacks get the parsed body (header + data)
    assert "header" in done[0] and "data" in done[0]


def test_http_error_callback_and_continue(http_worker):
    loop, server = http_worker
    client = HTTPClient(port=server.port)
    errors = []
    bodies = loop.run_until_complete(
        client.apost(
            "/boom",
            [Document(text="x"), Document(text="y")],
            request_size=1,
            on_error=errors.append,
            return_responses=True,
        )
    )
    assert len(errors) == 2  # both chunks failed, raise suppressed
    assert len(bodies) == 2
    assert "intentional failure" in str(bodies[0]["header"]["status"])

    from marie_tpu.excepts import BadServer

    with pytest.raises(BadServer, match="intentional failure"):
        loop.run_until_complete(client.apost("/boom", [Document(text="z")]))

    # continue_on_error without a callback also suppresses the raise;
    # the error envelope still carries the (unprocessed) input docs
    out = loop.run_until_complete(
        client.apost("/boom", [Document(text="z")], continue_on_error=True)
    )
    assert [d.text for d in out] == ["z"]


def test_http_retry_on_transient_503():
    from aiohttp import web

    attempts = {"n": 0}

    async def flaky_post(request):
        attempts["n"] += 1
        if attempts["n"] <= 2:
            return web.json_response({"error": "unavailable"}, status=503)
        return web.json_response(
            {"header": {"status": {"code": 0}},
             "data": [{"id": "d0", "text": "ok"}]}
        )

    async def _run():
        app = web.Application()
        app.router.add_post("/post", flaky_post)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = runner.addresses[0][1]
        try:
            client = HTTPClient(port=port)
            docs = await client.apost(
                "/e", [Document(text="x")],
                max_attempts=4, initial_backoff=0.01, max_backoff=0.02,
            )
            return list(docs)
        finally:
            await runner.cleanup()

    docs = asyncio.new_event_loop().run_until_complete(_run())
    assert attempts["n"] == 3  # two 503s then success
    assert docs[0].text == "ok"


def test_http_retry_exhaustion_raises():
    from aiohttp import web

    async def always_503(request):
        return web.json_response({}, status=503)

    async def _run():
        app = web.Application()
        app.router.add_post("/post", always_503)
        runner = web.AppRunner(app)
        await runner.setup()
        site = web.TCPSite(runner, "127.0.0.1", 0)
        await site.start()
        port = runner.addresses[0][1]
        try:
            client = HTTPClient(port=port)
            await client.apost(
                "/e", [Document(text="x")],
                max_attempts=2, initial_backoff=0.01,
            )
        finally:
            await runner.cleanup()

    from marie_tpu.excepts import BadServer

    # the final 503 is surfaced as a server error once retries exhaust
    with pytest.raises(BadServer, match="HTTP 503"):
        asyncio.new_event_loop().run_until_complete(_run())


def test_openapi_and_cors(http_worker):
    """/openapi.json reflects the live exec endpoints; cors=True adds
    allow-all headers + preflight (reference FastAPI gateway parity)."""
    import asyncio as _asyncio

    import aiohttp

    loop, server = http_worker

    async def check_openapi():
        async with aiohttp.ClientSession() as s:
            async with s.get(f"http://127.0.0.1:{server.port}/openapi.json") as r:
                assert r.status == 200
                spec = await r.json()
        assert spec["openapi"].startswith("3.")
        assert "/post" in spec["paths"]
        enum = spec["paths"]["/post"]["post"]["requestBody"]["content"][
            "application/json"]["schema"]["properties"]["execEndpoint"]["enum"]
        assert "/echo" in enum

    loop.run_until_complete(check_openapi())

    async def check_cors():
        from marie_tpu.serve.runtimes.servers.http_server import HTTPServer
        from marie_tpu.serve.runtimes.worker.request_handling import (
            WorkerRequestHandler,
        )
        from tests.integration.executors import EchoExecutor

        srv = HTTPServer(WorkerRequestHandler(uses=EchoExecutor, name="c"),
                         name="cors", cors=True)
        await srv.setup_server()
        try:
            async with aiohttp.ClientSession() as s:
                async with s.options(f"{srv.address}/post") as r:
                    assert r.status == 204
                    assert r.headers["Access-Control-Allow-Origin"] == "*"
                async with s.get(f"{srv.address}/health") as r:
                    assert r.headers["Access-Control-Allow-Origin"] == "*"
        finally:
            await srv.shutdown()

    _asyncio.new_event_loop().run_until_complete(check_cors())
