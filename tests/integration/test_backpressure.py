"""Prefetch/backpressure semantics (reference tests/core/test_backpressure)."""

import asyncio

import pytest

from marie_tpu.serve.runtimes.gateway.request_handling import GatewayRequestHandler
from marie_tpu.serve.runtimes.servers import GRPCServer
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest
from tests.integration.executors import SlowCountingExecutor


async def _gateway_over_slow_worker(prefetch):
    worker = WorkerRequestHandler(
        executor=SlowCountingExecutor(delay=0.2), name="slow"
    )
    server = GRPCServer(worker, name="slow")
    await server.setup_server()
    gw = GatewayRequestHandler(
        graph_representation={"start-gateway": ["slow"], "slow": ["end-gateway"]},
        executor_addresses={"slow": [server.address]},
        prefetch=prefetch,
    )
    return worker, server, gw


async def test_prefetch_limits_inflight():
    worker, server, gw = await _gateway_over_slow_worker(prefetch=2)
    try:
        reqs = [
            DataRequest.from_docs(DocumentArray([Document()]), "/slow")
            for _ in range(8)
        ]
        await asyncio.gather(*(gw.process_data([r]) for r in reqs))
        assert worker.executor._max_inflight <= 2
    finally:
        await gw.close()
        await server.shutdown()


async def test_no_prefetch_allows_full_concurrency():
    worker, server, gw = await _gateway_over_slow_worker(prefetch=0)
    try:
        reqs = [
            DataRequest.from_docs(DocumentArray([Document()]), "/slow")
            for _ in range(8)
        ]
        await asyncio.gather(*(gw.process_data([r]) for r in reqs))
        assert worker.executor._max_inflight >= 4  # unconstrained
    finally:
        await gw.close()
        await server.shutdown()
