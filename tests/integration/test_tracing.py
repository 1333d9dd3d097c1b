"""Cross-hop trace propagation (aux-subsystem gap from VERDICT r1: no
OTEL cross-hop context propagation). W3C traceparent rides gRPC metadata
from the client through every hop; spans share one trace id."""

import asyncio

from marie_tpu.serve.instrumentation import tracing
from marie_tpu.serve.runtimes.servers.grpc_server import GRPCServer
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from tests.integration.executors import EchoExecutor


def test_traceparent_roundtrip():
    ctx = tracing.SpanContext.new_root()
    header = ctx.to_traceparent()
    assert header.startswith("00-") and header.endswith("-01")
    parsed = tracing.SpanContext.from_traceparent(header)
    assert parsed == ctx
    assert tracing.SpanContext.from_traceparent("garbage") is None


def test_span_nesting_and_collector():
    tracing.collector.drain()
    with tracing.start_span("outer") as outer:
        with tracing.start_span("inner") as inner:
            pass
    spans = {s.name: s for s in tracing.collector.drain()}
    assert spans["inner"].trace_id == spans["outer"].trace_id
    assert spans["inner"].parent_span_id == spans["outer"].span_id
    assert spans["outer"].parent_span_id is None
    assert inner.trace_id == outer.trace_id


def test_client_to_server_single_trace():
    """Client span and the server's rpc span share the trace id (in-
    process server so both ends write to the same collector)."""
    from marie_tpu.clients import Client

    tracing.collector.drain()
    handler = WorkerRequestHandler(uses=EchoExecutor, name="traced")

    async def drive():
        server = GRPCServer(handler, name="traced")
        await server.setup_server()
        try:
            from marie_tpu.types.docs import Document

            client = Client(port=server.port)
            docs = await client.apost("/echo", [Document(text="t")])
            assert docs.texts == ["echo:t"]
        finally:
            await server.shutdown()

    asyncio.run(drive())
    spans = tracing.collector.drain()
    by_name = {s.name: s for s in spans}
    assert "client/post" in by_name and "rpc/traced" in by_name
    client_span = by_name["client/post"]
    rpc_span = by_name["rpc/traced"]
    assert rpc_span.trace_id == client_span.trace_id
    assert rpc_span.parent_span_id == client_span.span_id
    assert rpc_span.attributes["endpoint"] == "/echo"


def test_spans_export_jsonl(tmp_path):
    tracing.collector.drain()
    with tracing.start_span("export-me", {"k": "v"}):
        pass
    path = str(tmp_path / "spans.jsonl")
    n = tracing.collector.export_jsonl(path)
    assert n == 1
    import json

    rec = json.loads(open(path).read().strip())
    assert rec["name"] == "export-me"
    assert rec["attributes"]["k"] == "v"
    assert rec["duration_ms"] >= 0
