"""etcd v3 gRPC client — real ``etcdserverpb`` wire protocol, no etcd3
library and no codegen.

Counterpart of the reference's ``EtcdClient``
(``/root/reference/marie/serve/discovery/etcd_client.py:118`` — etcd3
watches + leases driving gateway elasticity).  Messages are hand-encoded
with the minimal protobuf codec (``marie_tpu/proto/pbwire.py``) against
etcd's published ``rpc.proto``/``kv.proto`` field numbers, so this client
talks to a REAL etcd cluster; tests exercise it against an in-process
fake speaking the same wire format
(``tests/integration/test_remote_fakes.py``).

The public surface matches :class:`marie_tpu.serve.discovery.DiscoveryClient`
(put/delete/get_prefix/register/watch/close), so the gateway's discovery
can be pointed at etcd by swapping the client class.
"""

import asyncio
from typing import Callable, Dict, Optional

import grpc

from marie_tpu.logging_core import MarieLogger
from marie_tpu.proto import pbwire

_KV_RANGE = "/etcdserverpb.KV/Range"
_KV_PUT = "/etcdserverpb.KV/Put"
_KV_DELETE = "/etcdserverpb.KV/DeleteRange"
_LEASE_GRANT = "/etcdserverpb.Lease/LeaseGrant"
_LEASE_KEEPALIVE = "/etcdserverpb.Lease/LeaseKeepAlive"
_WATCH = "/etcdserverpb.Watch/Watch"

DEFAULT_LEASE_TTL = 6


def prefix_range_end(prefix: bytes) -> bytes:
    """etcd prefix query: range_end = prefix with last byte + 1."""
    end = bytearray(prefix)
    for i in reversed(range(len(end))):
        if end[i] < 0xFF:
            end[i] += 1
            return bytes(end[: i + 1])
    return b"\x00"


class EtcdClient:
    """Async etcd v3 client over the real gRPC API."""

    def __init__(self, address: str = "127.0.0.1:2379"):
        self.address = address
        self.logger = MarieLogger("EtcdClient")
        self._channel: Optional[grpc.aio.Channel] = None
        self._keepalive_tasks: Dict[str, asyncio.Task] = {}
        self._leases: Dict[str, int] = {}

    def _chan(self) -> grpc.aio.Channel:
        if self._channel is None:
            self._channel = grpc.aio.insecure_channel(self.address)
        return self._channel

    async def _unary(self, method: str, msg: pbwire.Msg) -> Dict:
        stub = self._chan().unary_unary(
            method,
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        return pbwire.decode(await stub(pbwire.encode(msg)))

    # --- KV ------------------------------------------------------------
    async def put(
        self, key: str, value: str, ttl: Optional[float] = None
    ) -> None:
        """PutRequest{key=1, value=2, lease=3}."""
        lease_id = 0
        if ttl:
            lease_id = await self._grant_lease(int(ttl))
            self._leases[key] = lease_id
        await self._unary(
            _KV_PUT, {1: key.encode(), 2: value.encode(), 3: lease_id}
        )

    async def delete(self, key: str) -> None:
        self._stop_keepalive(key)
        await self._unary(_KV_DELETE, {1: key.encode()})

    async def get_prefix(self, prefix: str) -> Dict[str, str]:
        """RangeRequest{key=1, range_end=2} -> RangeResponse{kvs=2}."""
        resp = await self._unary(
            _KV_RANGE,
            {1: prefix.encode(), 2: prefix_range_end(prefix.encode())},
        )
        out: Dict[str, str] = {}
        for raw in resp.get(2, []):  # repeated mvccpb.KeyValue
            kv = pbwire.decode(raw)
            out[pbwire.first(kv, 1, b"").decode()] = pbwire.first(
                kv, 5, b""
            ).decode()
        return out

    # --- leases ----------------------------------------------------------
    async def _grant_lease(self, ttl: int) -> int:
        """LeaseGrantRequest{TTL=1} -> LeaseGrantResponse{ID=2}."""
        resp = await self._unary(_LEASE_GRANT, {1: ttl})
        return int(pbwire.first(resp, 2, 0))

    async def register(
        self, key: str, value: str, ttl: float = DEFAULT_LEASE_TTL
    ) -> None:
        """PUT with a lease refreshed in the background (the reference's
        worker-registration semantics, etcd_client.py:344)."""
        await self.put(key, value, ttl=max(int(ttl), 1))
        self._stop_keepalive(key)
        self._keepalive_tasks[key] = asyncio.create_task(
            self._keepalive_loop(key, max(ttl, 1.0))
        )

    def _stop_keepalive(self, key: str) -> None:
        task = self._keepalive_tasks.pop(key, None)
        if task:
            task.cancel()

    async def _keepalive_loop(self, key: str, ttl: float) -> None:
        """LeaseKeepAlive bidi stream: send {ID=1} every ttl/3."""
        lease_id = self._leases.get(key, 0)
        if not lease_id:
            return
        try:
            stub = self._chan().stream_stream(
                _LEASE_KEEPALIVE,
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )

            async def requests():
                while True:
                    yield pbwire.encode({1: lease_id})
                    await asyncio.sleep(ttl / 3)

            async for raw in stub(requests()):
                resp = pbwire.decode(raw)
                if int(pbwire.first(resp, 3, 0)) <= 0:  # TTL gone
                    self.logger.warning(f"lease for {key} expired")
                    return
        except asyncio.CancelledError:
            pass
        except grpc.aio.AioRpcError as ex:
            self.logger.warning(f"keepalive for {key} failed: {ex.code()}")

    # --- watch -----------------------------------------------------------
    async def watch(
        self, prefix: str, callback: Callable[[dict], None]
    ) -> asyncio.Task:
        """Watch bidi stream; events map to the DiscoveryClient dict shape
        {'op': put|delete, 'key': ..., 'value': ...}."""

        async def _consume():
            stub = self._chan().stream_stream(
                _WATCH,
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            create = pbwire.encode(
                {
                    1: {  # WatchCreateRequest
                        1: prefix.encode(),
                        2: prefix_range_end(prefix.encode()),
                    }
                }
            )

            async def requests():
                yield create
                while True:  # keep the stream open
                    await asyncio.sleep(3600)

            async for raw in stub(requests()):
                resp = pbwire.decode(raw)
                for ev_raw in resp.get(11, []):  # repeated mvccpb.Event
                    ev = pbwire.decode(ev_raw)
                    ev_type = int(pbwire.first(ev, 1, 0))  # 0=PUT 1=DELETE
                    kv = pbwire.decode(pbwire.first(ev, 2, b""))
                    event = {
                        "op": "put" if ev_type == 0 else "delete",
                        "key": pbwire.first(kv, 1, b"").decode(),
                        "value": pbwire.first(kv, 5, b"").decode(),
                    }
                    try:
                        callback(event)
                    except Exception as ex:  # noqa: BLE001
                        self.logger.error(f"watch callback failed: {ex!r}")

        return asyncio.create_task(_consume())

    async def close(self) -> None:
        for key in list(self._keepalive_tasks):
            self._stop_keepalive(key)
        if self._channel is not None:
            await self._channel.close()
