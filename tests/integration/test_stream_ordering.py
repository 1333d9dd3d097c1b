"""Bidi-stream result ordering (reference results_in_order,
marie/serve/runtimes/gateway/streamer.py:222 + tests test_return_order)."""

import asyncio

from marie_tpu.clients.grpc_client import GRPCClient
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest
from tests.integration.executors import SleepyExecutor


def _requests(delays):
    for i, delay in enumerate(delays):
        yield DataRequest.from_docs(
            DocumentArray(
                [Document(id=f"d{i}", text=str(i), tags={"delay": delay})]
            ),
            endpoint="/default",
        )


def _drive(flow_port, **kw):
    client = GRPCClient(port=flow_port)

    async def run():
        out = []
        async for resp in client.astream(_requests([0.6, 0.05, 0.05]), **kw):
            out.append(resp.docs[0].text)
        return out

    return asyncio.run(run())


def test_default_stream_is_completion_order():
    with Flow(prefetch=8).add(uses=SleepyExecutor, name="sleepy") as f:
        out = _drive(f.port_gateway)
    assert sorted(out) == ["done:0", "done:1", "done:2"]
    assert out[-1] == "done:0", f"slow request should finish last, got {out}"


def test_results_in_order_preserves_submission_order():
    with Flow(prefetch=8).add(uses=SleepyExecutor, name="sleepy") as f:
        out = _drive(f.port_gateway, results_in_order=True)
    assert out == ["done:0", "done:1", "done:2"]
