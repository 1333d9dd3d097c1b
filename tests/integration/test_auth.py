"""Serving-plane auth enforcement (ADVICE r1: APIKeyManager must gate
gRPC/HTTP/WebSocket routes; restore paths confined to the snapshot dir).

Reference behavior: marie/auth/auth_bearer.py TokenBearer +
config/service/marie.yml:266-276 (keys in YAML enable the guard)."""

import asyncio

import grpc
import pytest

from marie_tpu.auth import APIKeyManager
from marie_tpu.clients import Client
from marie_tpu.orchestrate.deployments import Deployment
from marie_tpu.types.docs import Document
from tests.integration.executors import EchoExecutor


@pytest.fixture
def api_key():
    APIKeyManager.clear()
    key = APIKeyManager.add_key("test-service")
    yield key
    APIKeyManager.clear()


def test_grpc_rejects_without_key_and_accepts_with(api_key):
    # keys propagate into the spawned pod via Pod auth_keys kwargs
    with Deployment(uses=EchoExecutor, name="echo-auth") as dep:
        port = dep.first_port
        with pytest.raises(grpc.aio.AioRpcError) as ei:
            Client(port=port).post("/echo", [Document(text="x")])
        assert ei.value.code() == grpc.StatusCode.UNAUTHENTICATED

        with pytest.raises(grpc.aio.AioRpcError):
            Client(port=port, api_key="mas_wrong").post(
                "/echo", [Document(text="x")]
            )

        docs = Client(port=port, api_key=api_key).post(
            "/echo", [Document(text="hi")]
        )
        assert docs.texts == ["echo:hi"]

        # health probe stays open for orchestrators
        async def check():
            async with grpc.aio.insecure_channel(f"127.0.0.1:{port}") as ch:
                stub = ch.unary_unary(
                    "/grpc.health.v1.Health/Check",
                    request_serializer=lambda b: b,
                    response_deserializer=lambda b: b,
                )
                return await stub(b"", timeout=5.0)

        assert asyncio.run(check()) == bytes([0x08, 0x01])  # SERVING


def test_http_routes_gated(api_key):
    import aiohttp

    from marie_tpu.serve.runtimes.servers.http_server import HTTPServer

    class _Handler:
        async def process_data(self, requests):
            return requests[0]

        def endpoints(self):
            return {"endpoints": ["/echo"]}

        def info(self):
            return {}

    async def drive():
        server = HTTPServer(_Handler(), name="auth-test")
        await server.setup_server()
        try:
            base = server.address
            async with aiohttp.ClientSession() as s:
                async with s.get(f"{base}/health") as r:
                    assert r.status == 200  # probe open
                async with s.post(
                    f"{base}/post", json={"execEndpoint": "/echo", "data": []}
                ) as r:
                    assert r.status == 401
                async with s.post(
                    f"{base}/post",
                    json={"execEndpoint": "/echo", "data": []},
                    headers={"Authorization": f"Bearer {api_key}"},
                ) as r:
                    assert r.status == 200
        finally:
            await server.shutdown()

    asyncio.run(drive())


def test_restore_path_confined():
    """Client-controlled restore paths outside /tmp/marie/snapshots fail."""
    from marie_tpu.proto import marie_pb2

    APIKeyManager.clear()  # auth off: this tests path confinement alone
    with Deployment(uses=EchoExecutor, name="echo-restore") as dep:
        async def drive(path):
            async with grpc.aio.insecure_channel(
                f"127.0.0.1:{dep.first_port}"
            ) as ch:
                stub = ch.unary_unary(
                    "/jina.JinaExecutorRestore/restore",
                    request_serializer=lambda b: b,
                    response_deserializer=lambda b: b,
                )
                cmd = marie_pb2.RestoreSnapshotCommand()
                cmd.snapshot_file = path
                raw = await stub(cmd.SerializeToString(), timeout=5.0)
                proto = marie_pb2.RestoreSnapshotStatusProto()
                proto.ParseFromString(raw)
                return proto.status

        assert asyncio.run(drive("/etc/passwd")) == (
            marie_pb2.RestoreSnapshotStatusProto.FAILED
        )
        assert asyncio.run(drive("/tmp/marie/snapshots/../../etc/passwd")) == (
            marie_pb2.RestoreSnapshotStatusProto.FAILED
        )
