"""Prometheus exposition + per-job worker KV records (VERDICT r1 #9).

Reference: marie/serve/runtimes/monitoring.py (per-runtime metrics on
port_monitoring) and worker request_handling.py:1460-1556 (job records)."""

import asyncio
import json

import pytest

from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest
from tests.integration.executors import EchoExecutor


def _req(endpoint="/echo", params=None, texts=("a",)):
    return DataRequest.from_docs(
        DocumentArray([Document(text=t) for t in texts]),
        endpoint=endpoint,
        parameters=params or {},
    )


def test_worker_metrics_move_and_render():
    from marie_tpu.metrics import get_registry, render_prometheus

    handler = WorkerRequestHandler(uses=EchoExecutor, name="obs-echo")
    before = get_registry().metric(
        "request_seconds", dimensions={"runtime": "worker", "executor": "obs-echo"}
    ).total_count
    asyncio.run(handler.process_data([_req()]))
    asyncio.run(handler.process_data([_req()]))
    text = render_prometheus()
    assert "marie_request_seconds" in text
    assert 'executor="obs-echo"' in text
    assert "marie_request_docs_total" in text
    after = get_registry().metric(
        "request_seconds", dimensions={"runtime": "worker", "executor": "obs-echo"}
    ).total_count
    assert after == before + 2
    # wire-size metrics moved too (reference request/response size
    # monitoring, request_handling.py:532-585)
    for name in ("received_request_bytes", "sent_response_bytes"):
        m = get_registry().metric(
            name, dimensions={"runtime": "worker", "executor": "obs-echo"}
        )
        assert m.total_count >= 2
        assert m.total > 0


def test_worker_failure_counter():
    from marie_tpu.metrics import get_registry

    handler = WorkerRequestHandler(uses=EchoExecutor, name="obs-fail")
    asyncio.run(handler.process_data([_req(endpoint="/boom")]))
    failed = get_registry().metric(
        "failed_requests", dimensions={"runtime": "worker", "executor": "obs-fail"}
    )
    assert failed.total >= 1


def test_job_kv_records(tmp_path):
    kv_path = str(tmp_path / "jobs.db")
    handler = WorkerRequestHandler(
        uses=EchoExecutor, name="obs-job", job_kv_path=kv_path
    )
    asyncio.run(handler.process_data([_req(params={"job_id": "j-1"})]))
    asyncio.run(handler.process_data([_req(endpoint="/boom", params={"job_id": "j-2"})]))

    from marie_tpu.storage.kv.sqlite_kv import SqliteKV

    kv = SqliteKV(kv_path)
    ok = json.loads(
        asyncio.run(kv.internal_kv_get("job/j-1/worker/obs-job", namespace="worker_jobs"))
    )
    assert ok["state"] == "successful"
    bad = json.loads(
        asyncio.run(kv.internal_kv_get("job/j-2/worker/obs-job", namespace="worker_jobs"))
    )
    assert bad["state"] == "failed"
    assert "error" in bad


def test_http_metrics_route_open_even_with_auth():
    import aiohttp

    from marie_tpu.auth import APIKeyManager
    from marie_tpu.serve.runtimes.servers.http_server import HTTPServer

    APIKeyManager.clear()
    APIKeyManager.add_key("metrics-test")
    handler = WorkerRequestHandler(uses=EchoExecutor, name="obs-http")

    async def drive():
        server = HTTPServer(handler, name="obs-http")
        await server.setup_server()
        try:
            async with aiohttp.ClientSession() as s:
                async with s.get(f"{server.address}/metrics") as r:
                    assert r.status == 200
                    body = await r.text()
                    assert "marie_request_seconds" in body
        finally:
            await server.shutdown()

    try:
        asyncio.run(drive())
    finally:
        APIKeyManager.clear()


def test_pod_monitoring_port(port_generator):
    """A gRPC worker pod exposes /metrics on its dedicated monitoring port
    (reference port_monitoring semantics)."""
    import urllib.request

    from marie_tpu.clients import Client
    from marie_tpu.orchestrate.pods import Pod

    mport = port_generator()
    with Pod(
        "worker", uses=EchoExecutor, name="obs-pod", port_monitoring=mport
    ) as pod:
        Client(port=pod.port).post("/echo", [Document(text="x")])
        body = (
            urllib.request.urlopen(f"http://127.0.0.1:{mport}/metrics", timeout=5)
            .read()
            .decode()
        )
        assert "marie_request_seconds" in body
        assert 'executor="obs-pod"' in body
