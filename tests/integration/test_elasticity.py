"""Discovery-driven gateway elasticity + snapshot/restore + websocket
(reference aux subsystems, SURVEY.md §5)."""

import asyncio
import json

import numpy as np
import pytest

from marie_tpu.helper import random_port
from marie_tpu.serve.discovery import DiscoveryClient, DiscoveryServer
from marie_tpu.serve.runtimes.asyncio_runtime import AsyncNewLoopRuntime
from marie_tpu.serve.runtimes.gateway.request_handling import GatewayRequestHandler
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest
from tests.integration.executors import EchoExecutor, SnapshotExecutor, UpperExecutor


async def _start_worker(executor_cls, name):
    handler = WorkerRequestHandler(executor=executor_cls(), name=name)
    from marie_tpu.serve.runtimes.servers import GRPCServer

    server = GRPCServer(handler, name=name)
    await server.setup_server()
    return server


async def test_gateway_elasticity_via_discovery():
    disc = DiscoveryServer()
    await disc.start()
    w1 = await _start_worker(UpperExecutor, "workers")
    w2 = await _start_worker(UpperExecutor, "workers")
    try:
        client = DiscoveryClient(disc.address)
        await client.register(
            "gateway/workers/r1", json.dumps({"address": w1.address}), ttl=2.0
        )

        gw = GatewayRequestHandler(
            graph_representation={"start-gateway": ["workers"], "workers": ["end-gateway"]},
            executor_addresses={"workers": [w1.address]},
        )
        await gw.start_discovery(disc.address)

        req = DataRequest.from_docs(
            DocumentArray([Document(text="a")]), endpoint="/default"
        )
        resp = await gw.process_data([req])
        assert resp.docs.texts == ["A"]

        # second worker joins -> topology rebuild includes it
        await client.register(
            "gateway/workers/r2", json.dumps({"address": w2.address}), ttl=2.0
        )
        await asyncio.sleep(0.5)
        assert set(gw.streamer.connection_pool.addresses("workers")) == {
            w1.address, w2.address,
        }

        # worker 1 goes away (lease released) -> removed from routing
        await client.delete("gateway/workers/r1")
        await asyncio.sleep(0.5)
        assert gw.streamer.connection_pool.addresses("workers") == [w2.address]
        # traffic still flows through the survivor
        resp = await gw.process_data(
            [DataRequest.from_docs(DocumentArray([Document(text="b")]), "/default")]
        )
        assert resp.docs.texts == ["B"]

        await gw.stop_discovery()
        await gw.close()
        await client.close()
    finally:
        await w1.shutdown()
        await w2.shutdown()
        await disc.stop()


async def test_snapshot_restore_rpc_roundtrip(tmp_path):
    import grpc

    from marie_tpu.proto import marie_pb2

    handler = WorkerRequestHandler(executor=SnapshotExecutor(), name="snap")
    from marie_tpu.serve.runtimes.servers import GRPCServer

    server = GRPCServer(handler, name="snap")
    await server.setup_server()
    try:
        # bump state
        req = DataRequest.from_docs(
            DocumentArray([Document(), Document()]), endpoint="/incr"
        )
        await handler.process_data([req])
        assert handler.executor.counter == 2

        async with grpc.aio.insecure_channel(server.address) as ch:
            snap_stub = ch.unary_unary(
                "/jina.JinaExecutorSnapshot/snapshot",
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            raw = await snap_stub(b"")
            status = marie_pb2.SnapshotStatusProto()
            status.ParseFromString(raw)
            assert status.status == marie_pb2.SnapshotStatusProto.SUCCEEDED
            snapshot_file = status.snapshot_file

            handler.executor.counter = 0
            restore_stub = ch.unary_unary(
                "/jina.JinaExecutorRestore/restore",
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            cmd = marie_pb2.RestoreSnapshotCommand()
            cmd.snapshot_file = snapshot_file
            raw = await restore_stub(cmd.SerializeToString())
            rstatus = marie_pb2.RestoreSnapshotStatusProto()
            rstatus.ParseFromString(raw)
            assert (
                rstatus.status
                == marie_pb2.RestoreSnapshotStatusProto.SUCCEEDED
            )
            assert handler.executor.counter == 2
    finally:
        await server.shutdown()


async def test_websocket_server_roundtrip():
    import aiohttp

    from marie_tpu.serve.runtimes.servers import WebSocketServer

    handler = WorkerRequestHandler(executor=EchoExecutor(), name="ws")
    server = WebSocketServer(handler, name="ws")
    await server.setup_server()
    try:
        async with aiohttp.ClientSession() as session:
            async with session.ws_connect(server.address) as ws:
                await ws.send_json(
                    {
                        "execEndpoint": "/echo",
                        "data": DocumentArray([Document(text="ws")]).to_dict(),
                    }
                )
                msg = await asyncio.wait_for(ws.receive_json(), 10)
                assert msg["header"]["status"]["code"] == 0
                docs = DocumentArray.from_dict(msg["data"])
                assert docs.texts == ["echo:ws"]
                # bad payload -> error response, socket stays open
                await ws.send_str("not-json")
                msg = await asyncio.wait_for(ws.receive_json(), 10)
                assert "error" in msg
    finally:
        await server.shutdown()


async def test_pod_deregisters_on_graceful_shutdown():
    """A cleanly-stopped pod deletes its discovery key immediately —
    the gateway reroutes now, not after lease expiry (crashes still
    rely on the TTL reaper)."""
    import time

    from marie_tpu.orchestrate.pods import Pod

    disc = DiscoveryServer()
    await disc.start()
    client = DiscoveryClient(disc.address)
    pod = None
    try:
        pod = Pod(
            "worker", uses=EchoExecutor, name="r1", deployment="dereg",
            discovery_address=disc.address,
        )
        await asyncio.to_thread(pod.start)
        keys = await client.get_prefix("gateway/dereg/")
        assert "gateway/dereg/r1" in keys

        await asyncio.to_thread(pod.close)  # SIGTERM -> graceful stop
        deadline = time.time() + 3.0  # well under repeated-keepalive TTL
        while time.time() < deadline:
            keys = await client.get_prefix("gateway/dereg/")
            if "gateway/dereg/r1" not in keys:
                break
            await asyncio.sleep(0.1)
        assert "gateway/dereg/r1" not in keys
    finally:
        if pod is not None:
            pod.close()
        await client.close()
        await disc.stop()
