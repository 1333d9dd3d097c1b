"""Service discovery — lease-based registry with prefix watches.

Capability parity with the reference's etcd discovery
(``/root/reference/marie/serve/discovery/etcd_client.py:118`` — workers
register under ``gateway/`` with leases; the gateway watches the prefix
and rebuilds its streamer on change).  etcd3 is not available in this
environment, so the same semantics are provided by a small built-in
gRPC service: PUT-with-lease, keepalive, prefix GET, and server-side
streamed WATCH events.  The client API (register/lease/watch) matches
what the gateway needs, so an etcd-backed client can be swapped in
behind the same interface.
"""

import asyncio
import json
import time
from typing import AsyncIterator, Callable, Dict, List, Optional, Tuple

import grpc

from marie_tpu.helper import random_port
from marie_tpu.logging_core import MarieLogger

_SVC = "marie.Discovery"
_PUT = f"/{_SVC}/put"
_DELETE = f"/{_SVC}/delete"
_GET_PREFIX = f"/{_SVC}/get_prefix"
_KEEPALIVE = f"/{_SVC}/keepalive"
_WATCH = f"/{_SVC}/watch"

DEFAULT_LEASE_TTL = 6.0


def _enc(obj) -> bytes:
    return json.dumps(obj).encode()


def _dec(raw: bytes):
    return json.loads(raw.decode()) if raw else None


class DiscoveryServer:
    """In-process registry server (run it inside the gateway process or
    standalone)."""

    def __init__(self, port: Optional[int] = None, host: str = "0.0.0.0"):
        self.port = port or random_port()
        self.host = host
        self.logger = MarieLogger("DiscoveryServer")
        # key -> (value, expire_ts or None)
        self._store: Dict[str, Tuple[str, Optional[float]]] = {}
        self._watchers: List[asyncio.Queue] = []
        self._server: Optional[grpc.aio.Server] = None
        self._reaper: Optional[asyncio.Task] = None

    # --- handlers ------------------------------------------------------
    async def _put(self, raw: bytes, ctx) -> bytes:
        req = _dec(raw)
        ttl = req.get("ttl")
        expire = time.time() + ttl if ttl else None
        self._store[req["key"]] = (req["value"], expire)
        await self._emit("put", req["key"], req["value"])
        return _enc({"ok": True})

    async def _delete(self, raw: bytes, ctx) -> bytes:
        req = _dec(raw)
        existed = self._store.pop(req["key"], None)
        if existed is not None:
            await self._emit("delete", req["key"], existed[0])
        return _enc({"ok": existed is not None})

    async def _get_prefix(self, raw: bytes, ctx) -> bytes:
        req = _dec(raw)
        now = time.time()
        out = {
            k: v
            for k, (v, exp) in self._store.items()
            if k.startswith(req["prefix"]) and (exp is None or exp > now)
        }
        return _enc({"items": out})

    async def _keepalive(self, raw: bytes, ctx) -> bytes:
        req = _dec(raw)
        item = self._store.get(req["key"])
        if item is None:
            return _enc({"ok": False})
        value, _ = item
        ttl = req.get("ttl", DEFAULT_LEASE_TTL)
        self._store[req["key"]] = (value, time.time() + ttl)
        return _enc({"ok": True})

    async def _watch(self, raw: bytes, ctx) -> AsyncIterator[bytes]:
        req = _dec(raw)
        prefix = req.get("prefix", "")
        queue: asyncio.Queue = asyncio.Queue()
        self._watchers.append(queue)
        try:
            while True:
                event = await queue.get()
                if event["key"].startswith(prefix):
                    yield _enc(event)
        finally:
            self._watchers.remove(queue)

    async def _emit(self, op: str, key: str, value: str) -> None:
        for q in self._watchers:
            q.put_nowait({"op": op, "key": key, "value": value})

    async def _reap_loop(self) -> None:
        while True:
            await asyncio.sleep(1.0)
            now = time.time()
            expired = [
                k for k, (_, exp) in self._store.items()
                if exp is not None and exp <= now
            ]
            for k in expired:
                value, _ = self._store.pop(k)
                await self._emit("expire", k, value)

    # --- lifecycle -----------------------------------------------------
    async def start(self) -> None:
        self._server = grpc.aio.server()
        ident = lambda b: b  # noqa: E731

        handlers = {
            "put": grpc.unary_unary_rpc_method_handler(self._put, ident, ident),
            "delete": grpc.unary_unary_rpc_method_handler(self._delete, ident, ident),
            "get_prefix": grpc.unary_unary_rpc_method_handler(
                self._get_prefix, ident, ident
            ),
            "keepalive": grpc.unary_unary_rpc_method_handler(
                self._keepalive, ident, ident
            ),
            "watch": grpc.unary_stream_rpc_method_handler(self._watch, ident, ident),
        }
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SVC, handlers),)
        )
        bound = self._server.add_insecure_port(f"{self.host}:{self.port}")
        self.port = bound
        await self._server.start()
        self._reaper = asyncio.create_task(self._reap_loop())

    async def stop(self) -> None:
        if self._reaper:
            self._reaper.cancel()
        if self._server:
            await self._server.stop(grace=0.5)

    @property
    def address(self) -> str:
        return f"127.0.0.1:{self.port}"


class DiscoveryClient:
    """Client with lease keepalive + watch callbacks."""

    def __init__(self, address: str):
        self.address = address
        self.logger = MarieLogger("DiscoveryClient")
        self._channel: Optional[grpc.aio.Channel] = None
        self._keepalive_tasks: Dict[str, asyncio.Task] = {}

    def _chan(self) -> grpc.aio.Channel:
        if self._channel is None:
            self._channel = grpc.aio.insecure_channel(self.address)
        return self._channel

    async def _call(self, method: str, payload: dict) -> dict:
        stub = self._chan().unary_unary(
            method, request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        return _dec(await stub(_enc(payload)))

    # --- API -----------------------------------------------------------
    async def put(self, key: str, value: str, ttl: Optional[float] = None) -> None:
        await self._call(_PUT, {"key": key, "value": value, "ttl": ttl})

    async def delete(self, key: str) -> None:
        self._stop_keepalive(key)
        await self._call(_DELETE, {"key": key})

    async def get_prefix(self, prefix: str) -> Dict[str, str]:
        resp = await self._call(_GET_PREFIX, {"prefix": prefix})
        return resp["items"]

    async def register(
        self, key: str, value: str, ttl: float = DEFAULT_LEASE_TTL
    ) -> None:
        """PUT with a lease kept alive in the background (reference worker
        registration with etcd leases)."""
        await self.put(key, value, ttl=ttl)
        self._stop_keepalive(key)
        self._keepalive_tasks[key] = asyncio.create_task(
            self._keepalive_loop(key, ttl)
        )

    def _stop_keepalive(self, key: str) -> None:
        task = self._keepalive_tasks.pop(key, None)
        if task:
            task.cancel()

    async def _keepalive_loop(self, key: str, ttl: float) -> None:
        try:
            while True:
                await asyncio.sleep(ttl / 3)
                resp = await self._call(_KEEPALIVE, {"key": key, "ttl": ttl})
                if not resp.get("ok"):
                    self.logger.warning(f"lease for {key} lost")
                    return
        except asyncio.CancelledError:
            pass

    async def watch(
        self, prefix: str, callback: Callable[[dict], None]
    ) -> asyncio.Task:
        """Stream watch events to a callback; returns the consuming task."""

        async def _consume():
            stub = self._chan().unary_stream(
                _WATCH, request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            async for raw in stub(_enc({"prefix": prefix})):
                try:
                    callback(_dec(raw))
                except Exception as ex:  # noqa: BLE001
                    self.logger.error(f"watch callback failed: {ex!r}")

        return asyncio.create_task(_consume())

    async def close(self) -> None:
        for key in list(self._keepalive_tasks):
            self._stop_keepalive(key)
        if self._channel is not None:
            await self._channel.close()
