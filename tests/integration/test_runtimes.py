"""Serving-spine integration tests: real runtimes as local processes
driven over gRPC/HTTP (the reference's dominant test pattern, SURVEY.md §4)."""

import numpy as np
import pytest

from marie_tpu.clients import Client
from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document, DocumentArray
from tests.integration.executors import (
    BatchRecordingExecutor,
    EchoExecutor,
    SuffixExecutor,
    UpperExecutor,
)


@pytest.fixture(scope="module")
def echo_deployment():
    with Deployment(uses=EchoExecutor, name="echo") as dep:
        yield dep


def test_grpc_roundtrip(echo_deployment):
    client = Client(port=echo_deployment.first_port)
    docs = client.post("/echo", [Document(text="hi"), Document(text="yo")])
    assert docs.texts == ["echo:hi", "echo:yo"]


def test_parameters_reach_executor(echo_deployment):
    client = Client(port=echo_deployment.first_port)
    docs = client.post(
        "/tag", [Document(text="x")], parameters={"value": "v42"}
    )
    assert docs[0].tags["tagged"] == "v42"


def test_executor_error_travels_to_client(echo_deployment):
    from marie_tpu.excepts import BadServer

    client = Client(port=echo_deployment.first_port)
    with pytest.raises(BadServer, match="intentional failure"):
        client.post("/boom", [Document(text="x")])


def test_unknown_endpoint_skips_executor(echo_deployment):
    """Endpoint mismatch without /default is a SKIP, not an error: the
    docs come back unchanged (reference request_handling.py:714-726 —
    flow hops that don't serve an endpoint pass the request through)."""
    client = Client(port=echo_deployment.first_port)
    docs = client.post("/nope", [Document(text="x")])
    assert docs[0].text == "x"


def test_tensor_payload_roundtrip(echo_deployment):
    client = Client(port=echo_deployment.first_port)
    t = np.arange(12, dtype=np.float32).reshape(3, 4)
    docs = client.post("/echo", [Document(text="t", tensor=t)])
    np.testing.assert_array_equal(docs[0].tensor, t)


def test_replicas_balance():
    with Deployment(uses=UpperExecutor, name="up", replicas=2) as dep:
        assert len(dep.addresses) == 2
        # both replicas answer
        for addr in dep.addresses:
            port = int(addr.split(":")[1])
            docs = Client(port=port).post("/default", [Document(text="a")])
            assert docs.texts == ["A"]


def test_flow_chained_executors():
    flow = (
        Flow()
        .add(uses=UpperExecutor, name="upper")
        .add(uses=SuffixExecutor, uses_with={"suffix": "!"}, name="suffix")
    )
    with flow:
        client = Client(port=flow.port_gateway)
        docs = client.post("/default", [Document(text="hello")])
        assert docs.texts == ["HELLO!"]


def test_flow_http_protocol_and_gateway_dry_run():
    flow = Flow(protocol=["grpc", "http"]).add(uses=UpperExecutor, name="up")
    with flow:
        grpc_client = Client(port=flow.port_gateway)
        assert grpc_client.dry_run()
        docs = grpc_client.post("/default", [Document(text="abc")])
        assert docs.texts == ["ABC"]


def test_dynamic_batching_merges_requests():
    import asyncio

    with Deployment(uses=BatchRecordingExecutor, name="batcher") as dep:
        client = Client(port=dep.first_port)

        async def run_many():
            tasks = [
                client.apost("/batch", [Document(text=str(i))])
                for i in range(8)
            ]
            return await asyncio.gather(*tasks)

        results = asyncio.run(run_many())
        sizes = sorted(int(r[0].tags["batch_size"]) for r in results)
        # batches merged: at least one request saw a batch > 1
        assert sizes[-1] > 1
        assert sum(1 for _ in results) == 8


def test_pod_process_death_detected():
    dep = Deployment(uses=UpperExecutor, name="mortal")
    dep.start()
    try:
        assert dep.is_ready()
        dep.pods[0]._process.terminate()
        dep.pods[0]._process.join(5)
        assert not dep.is_ready()
    finally:
        dep.close()


def test_stream_degrades_per_request_on_transport_failure():
    """A dead deployment fails each in-flight request with an error-status
    response; the bidi stream itself survives (reference RequestStreamer
    semantics — one request's transport failure must not abort siblings)."""
    import asyncio

    from marie_tpu.serve.runtimes.gateway.streamer import GatewayStreamer
    from marie_tpu.types.request import DataRequest

    async def run():
        streamer = GatewayStreamer(
            graph_representation={"start-gateway": ["ghost"], "ghost": []},
            executor_addresses={"ghost": ["127.0.0.1:1"]},  # nothing listens
            timeout=2.0,
        )

        async def reqs():
            for i in range(3):
                yield DataRequest.from_docs(
                    DocumentArray([Document(text=str(i))]), endpoint="/"
                )

        out = []
        async for resp in streamer.stream(reqs()):
            out.append(resp)
        await streamer.close()
        return out

    responses = asyncio.run(run())
    assert len(responses) == 3
    assert all(r.is_error() for r in responses)
