"""Generator executor endpoints stream documents INCREMENTALLY through
stream_doc (reference: ``__is_generator__`` endpoints yield docs one at a
time, ``marie/serve/runtimes/worker/request_handling.py:1027-1052``) —
the LLM-token-streaming serving shape."""

import asyncio
import json
import time

import grpc

from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.proto import marie_pb2
from tests.integration.executors import EchoExecutor, TokenStreamExecutor


def _stream_doc_stub(ch):
    return ch.unary_stream(
        "/jina.JinaSingleDocumentRequestRPC/stream_doc",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=marie_pb2.SingleDocumentRequestProto.FromString,
    )


def _single_doc_request(endpoint, text):
    sreq = marie_pb2.SingleDocumentRequestProto()
    sreq.header.exec_endpoint = endpoint
    sreq.document.data["id"].text = "d0"
    sreq.document.data["text"].text = text
    return sreq


def test_async_generator_endpoint_streams_incrementally():
    with Deployment(uses=TokenStreamExecutor, name="tok-stream") as dep:
        address = f"127.0.0.1:{dep.first_port}"

        async def drive():
            async with grpc.aio.insecure_channel(address) as ch:
                sd = _stream_doc_stub(ch)
                arrivals = []
                async for r in sd(_single_doc_request("/stream", "a b c d")):
                    arrivals.append(
                        (time.perf_counter(), r.document.data["text"].text)
                    )
                return arrivals

        arrivals = asyncio.run(drive())
    assert [t for _, t in arrivals] == ["a", "b", "c", "d"]
    # incremental delivery: the endpoint sleeps 50ms between yields, so a
    # buffered implementation would show ~0 spread between arrivals
    spread = arrivals[-1][0] - arrivals[0][0]
    assert spread > 0.08, f"docs arrived in a burst (spread {spread:.3f}s)"


def test_sync_generator_endpoint_streams():
    with Deployment(uses=TokenStreamExecutor, name="sync-stream") as dep:
        address = f"127.0.0.1:{dep.first_port}"

        async def drive():
            async with grpc.aio.insecure_channel(address) as ch:
                sd = _stream_doc_stub(ch)
                return [
                    r.document.data["text"].text
                    async for r in sd(_single_doc_request("/sync-stream", ""))
                ]

        texts = asyncio.run(drive())
    assert texts == ["part0", "part1", "part2"]


def test_non_generator_endpoint_keeps_full_result_contract():
    """stream_doc on a plain endpoint still yields the processed docs
    (the pre-existing fallback path)."""
    with Deployment(uses=EchoExecutor, name="plain-stream") as dep:
        address = f"127.0.0.1:{dep.first_port}"

        async def drive():
            async with grpc.aio.insecure_channel(address) as ch:
                sd = _stream_doc_stub(ch)
                return [
                    r.document.data["text"].text
                    async for r in sd(_single_doc_request("/echo", "one"))
                ]

        texts = asyncio.run(drive())
    assert texts == ["echo:one"]


def test_client_astream_doc_surface():
    """GRPCClient.astream_doc reaches the generator endpoint."""
    from marie_tpu.clients.grpc_client import GRPCClient
    from marie_tpu.types.docs import Document

    with Deployment(uses=TokenStreamExecutor, name="cli-stream") as dep:
        client = GRPCClient(port=dep.first_port)

        async def drive():
            return [
                d.text
                async for d in client.astream_doc(
                    "/stream", Document(id="d0", text="x y z")
                )
            ]

        texts = asyncio.run(drive())
    assert texts == ["x", "y", "z"]


def test_http_post_stream_ndjson():
    """The HTTP face: /post_stream flushes one NDJSON line per produced
    document, incrementally."""
    import aiohttp

    from marie_tpu.serve.runtimes.servers.http_server import HTTPServer
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )

    async def drive():
        handler = WorkerRequestHandler(
            executor=TokenStreamExecutor(), name="ndjson-stream"
        )
        server = HTTPServer(handler, name="ndjson-stream")
        await server.setup_server()
        try:
            base = server.address
            arrivals = []
            async with aiohttp.ClientSession() as s:
                async with s.post(
                    f"{base}/post_stream",
                    json={
                        "execEndpoint": "/stream",
                        "data": [{"id": "d0", "text": "alpha beta gamma"}],
                    },
                ) as r:
                    assert r.status == 200
                    assert r.headers["Content-Type"].startswith(
                        "application/x-ndjson"
                    )
                    async for line in r.content:
                        if line.strip():
                            arrivals.append(
                                (time.perf_counter(),
                                 json.loads(line)["text"])
                            )
            return arrivals
        finally:
            await server.shutdown()

    arrivals = asyncio.run(drive())
    assert [t for _, t in arrivals] == ["alpha", "beta", "gamma"]
    spread = arrivals[-1][0] - arrivals[0][0]
    assert spread > 0.05, f"NDJSON lines arrived in a burst ({spread:.3f}s)"


def test_generator_endpoint_rejected_on_unary_plane():
    """process_data on a generator endpoint returns a clear error
    envelope instead of silently dropping the generator."""
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )
    from marie_tpu.types.docs import Document, DocumentArray
    from marie_tpu.types.request import DataRequest

    async def drive():
        handler = WorkerRequestHandler(
            executor=TokenStreamExecutor(), name="unary-reject"
        )
        req = DataRequest.from_docs(
            DocumentArray([Document(id="d0", text="a b")]),
            endpoint="/stream",
        )
        return await handler.process_data([req])

    resp = asyncio.run(drive())
    assert resp.is_error()
    assert "generator endpoint" in " ".join(resp.status.exception.args)


def test_gateway_proxies_doc_stream():
    """Doc streaming through a gateway-fronted flow: the gateway proxies
    stream_doc to the worker and relays documents incrementally."""
    from marie_tpu.clients.grpc_client import GRPCClient
    from marie_tpu.orchestrate.flow import Flow
    from marie_tpu.types.docs import Document

    flow = Flow().add(uses=TokenStreamExecutor, name="tok")
    with flow:
        client = GRPCClient(port=flow.port_gateway)

        async def drive():
            return [
                d.text
                async for d in client.astream_doc(
                    "/stream", Document(id="d0", text="p q r")
                )
            ]

        texts = asyncio.run(drive())
    assert texts == ["p", "q", "r"]


def test_gateway_multi_hop_stream_doc_falls_back_to_dag():
    """stream_doc on a multi-executor flow without target_executor keeps
    the full-DAG contract (processed docs, non-incremental)."""
    from marie_tpu.clients.grpc_client import GRPCClient
    from marie_tpu.orchestrate.flow import Flow
    from marie_tpu.types.docs import Document
    from tests.integration.executors import SuffixExecutor, UpperExecutor

    flow = (
        Flow()
        .add(uses=UpperExecutor, name="upper")
        .add(uses=SuffixExecutor, name="suffix", needs=["upper"])
    )
    with flow:
        client = GRPCClient(port=flow.port_gateway)

        async def drive():
            return [
                d.text
                async for d in client.astream_doc(
                    "/default", Document(id="d0", text="ab")
                )
            ]

        texts = asyncio.run(drive())
    assert texts == ["AB!"]


def test_websocket_doc_streaming():
    """WS face of doc streaming: {"stream": true} yields one message per
    produced doc plus a done marker, incrementally."""
    import aiohttp

    from marie_tpu.serve.runtimes.servers.websocket_server import (
        WebSocketServer,
    )
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )

    async def drive():
        handler = WorkerRequestHandler(
            executor=TokenStreamExecutor(), name="ws-stream"
        )
        server = WebSocketServer(handler, name="ws-stream")
        await server.setup_server()
        try:
            arrivals = []
            async with aiohttp.ClientSession() as s:
                async with s.ws_connect(
                    f"http://127.0.0.1:{server.port}/"
                ) as ws:
                    await ws.send_json(
                        {
                            "execEndpoint": "/stream",
                            "stream": True,
                            "data": [{"id": "d0", "text": "p q r"}],
                            "header": {"requestId": "rq1"},
                        }
                    )
                    async for msg in ws:
                        body = json.loads(msg.data)
                        if body.get("done"):
                            break
                        arrivals.append(
                            (time.perf_counter(), body["doc"]["text"])
                        )
            return arrivals
        finally:
            await server.shutdown()

    arrivals = asyncio.run(drive())
    assert [t for _, t in arrivals] == ["p", "q", "r"]
    assert arrivals[-1][0] - arrivals[0][0] > 0.05, "WS burst delivery"


def test_ws_client_astream_doc_surface():
    """WebSocketClient.astream_doc mirrors the gRPC client surface."""
    from marie_tpu.clients.websocket_client import WebSocketClient
    from marie_tpu.serve.runtimes.servers.websocket_server import (
        WebSocketServer,
    )
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )
    from marie_tpu.types.docs import Document

    async def drive():
        server = WebSocketServer(
            WorkerRequestHandler(executor=TokenStreamExecutor(), name="wsc"),
            name="wsc",
        )
        await server.setup_server()
        try:
            client = WebSocketClient(port=server.port)
            return [
                d.text
                async for d in client.astream_doc(
                    "/stream", Document(id="d0", text="u v w")
                )
            ]
        finally:
            await server.shutdown()

    assert asyncio.run(drive()) == ["u", "v", "w"]
