"""Pin the pool's CancelledError discrimination: grpc-aio's "locally
cancelled" quirk (a dying channel surfaces CancelledError without anyone
cancelling the caller) must become a retryable attempt, while genuine
task cancellation must still propagate."""

import asyncio

import pytest

from marie_tpu.excepts import InternalNetworkError
from marie_tpu.serve.networking.connection_pool import GrpcConnectionPool
from marie_tpu.types.request import DataRequest


class _QuirkChannel:
    """unary_unary stub whose call raises CancelledError (grpc quirk)."""

    def __init__(self, calls):
        self._calls = calls

    def unary_unary(self, *a, **kw):
        async def call(req, timeout=None, metadata=None):
            self._calls.append(1)
            raise asyncio.CancelledError()

        return call


def _patch_channels(pool, channel):
    for rl in pool._deployments.values():
        for rep in rl.replicas:
            rep.get_channel = lambda ch=channel: ch

            async def _noop_reset():
                return None

            rep.reset = _noop_reset


def test_local_cancel_quirk_becomes_retryable():
    pool = GrpcConnectionPool(retries=2)
    pool.add_connection("x", "127.0.0.1:1")
    calls = []
    _patch_channels(pool, _QuirkChannel(calls))

    async def run():
        with pytest.raises(InternalNetworkError):
            await pool.send_requests_once([DataRequest()], deployment="x")
        # every attempt consumed the quirk path (retried, not aborted)
        assert len(calls) >= 2
        await pool.close()

    asyncio.run(run())


def test_genuine_cancellation_propagates():
    pool = GrpcConnectionPool(retries=3)
    pool.add_connection("x", "127.0.0.1:1")

    class _SlowChannel:
        def unary_unary(self, *a, **kw):
            async def call(req, timeout=None, metadata=None):
                await asyncio.sleep(30)

            return call

    _patch_channels(pool, _SlowChannel())

    async def run():
        task = asyncio.ensure_future(
            pool.send_requests_once([DataRequest()], deployment="x")
        )
        await asyncio.sleep(0.05)
        task.cancel()
        with pytest.raises(asyncio.CancelledError):
            await task
        await pool.close()

    asyncio.run(run())
