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


def test_otlp_http_export():
    """Spans ship to an OTLP/HTTP collector as the public JSON schema;
    a dead collector re-queues them for the next flush."""
    import http.server
    import json
    import threading

    from marie_tpu.serve.instrumentation import tracing

    received = []

    class Sink(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            received.append((self.path, json.loads(body)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Sink)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        tracing.collector.drain()
        with tracing.start_span("parent", {"k": "v"}):
            with tracing.start_span("child"):
                pass
        n = tracing.export_otlp_http(f"http://127.0.0.1:{srv.server_port}")
        assert n == 2
        path, body = received[0]
        assert path == "/v1/traces"
        spans = body["resourceSpans"][0]["scopeSpans"][0]["spans"]
        names = {s["name"] for s in spans}
        assert names == {"parent", "child"}
        child = next(s for s in spans if s["name"] == "child")
        parent = next(s for s in spans if s["name"] == "parent")
        assert child["traceId"] == parent["traceId"]
        assert child["parentSpanId"] == parent["spanId"]
        assert int(parent["endTimeUnixNano"]) >= int(parent["startTimeUnixNano"])
        attr = {a["key"]: a["value"]["stringValue"] for a in parent["attributes"]}
        assert attr["k"] == "v"
    finally:
        srv.shutdown()

    # dead collector: spans requeue instead of dropping
    tracing.collector.drain()
    with tracing.start_span("keep-me"):
        pass
    n = tracing.export_otlp_http("http://127.0.0.1:9")  # discard port
    assert n == 0
    assert [s.name for s in tracing.collector.snapshot()] == ["keep-me"]
