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
