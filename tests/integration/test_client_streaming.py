import asyncio

import pytest

from marie_tpu.clients import Client
from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest
from tests.integration.executors import EchoExecutor


@pytest.fixture(scope="module")
def echo_dep():
    with Deployment(uses=EchoExecutor, name="echo-stream") as dep:
        yield dep


async def test_bidi_streaming(echo_dep):
    client = Client(port=echo_dep.first_port)

    async def gen():
        for i in range(5):
            yield DataRequest.from_docs(
                DocumentArray([Document(text=f"m{i}")]), endpoint="/echo"
            )

    outs = []
    async for resp in client.astream(gen()):
        outs.append(resp.docs.texts[0])
    assert outs == [f"echo:m{i}" for i in range(5)]


async def test_profiling(echo_dep):
    client = Client(port=echo_dep.first_port)
    prof = await client.aprofiling()
    assert prof["total_seconds"] > 0
    assert "network_and_gateway_seconds" in prof


async def test_post_request_size_chunking(echo_dep):
    """request_size chunks a generator input into several requests; the
    returned docs concatenate in request order (reference Client.post)."""
    client = Client(port=echo_dep.first_port)

    def gen():
        for i in range(7):  # lazy generator input, 7 docs -> 3+3+1
            yield Document(text=f"g{i}")

    done, always = [], []
    docs = await client.apost(
        on="/echo", inputs=gen(), request_size=3,
        on_done=done.append, on_always=always.append,
    )
    assert docs.texts == [f"echo:g{i}" for i in range(7)]
    assert len(done) == 3 and len(always) == 3  # one per chunk


async def test_post_on_error_callback(echo_dep):
    """on_error suppresses the raise and receives the failed response."""
    client = Client(port=echo_dep.first_port)
    errors = []
    await client.apost(
        on="/boom", inputs=DocumentArray([Document(text="x")]),
        on_error=errors.append,
    )
    assert len(errors) == 1 and errors[0].is_error()


async def test_post_retries_exhausted_raises():
    """Transient UNAVAILABLE (nothing listening) retries then surfaces."""
    import time

    import grpc

    from marie_tpu.helper import random_port

    client = Client(port=random_port())
    t0 = time.time()
    with pytest.raises(grpc.aio.AioRpcError):
        await client.apost(
            on="/echo", inputs=DocumentArray([Document(text="x")]),
            max_attempts=3, initial_backoff=0.05, max_backoff=0.1,
        )
    assert time.time() - t0 >= 0.1  # backed off between the 3 attempts


async def test_websocket_client_roundtrip():
    from marie_tpu.clients import Client as ClientFactory
    from marie_tpu.serve.runtimes.servers import WebSocketServer
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )

    handler = WorkerRequestHandler(executor=EchoExecutor(), name="wsc")
    server = WebSocketServer(handler, name="wsc")
    await server.setup_server()
    try:
        client = ClientFactory(port=server.port, protocol="websocket")
        docs = await client.apost(
            on="/echo",
            inputs=[Document(text=f"w{i}") for i in range(5)],
            request_size=2,  # 3 requests over ONE socket
        )
        assert docs.texts == [f"echo:w{i}" for i in range(5)]
    finally:
        await server.shutdown()


async def test_scheduled_executor_service():
    from marie_tpu.concur import ScheduledExecutorService

    svc = ScheduledExecutorService()
    hits = []

    async def tick():
        hits.append(1)
        if len(hits) == 2:
            raise RuntimeError("transient")  # must not kill the schedule

    svc.schedule_at_fixed_rate("t", tick, interval=0.05)
    await asyncio.sleep(0.4)
    svc.shutdown()
    assert len(hits) >= 4  # survived the exception
    with pytest.raises(ValueError):
        svc.schedule_at_fixed_rate("t2", tick, 0.05)
        svc.schedule_at_fixed_rate("t2", tick, 0.05)
    svc.shutdown()
