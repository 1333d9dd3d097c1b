"""HeaderRequestHandler — fan-out/fan-in for sharded deployments.

Parity with the reference
(``/root/reference/marie/serve/runtimes/head/request_handling.py:36``):
``polling=ALL`` broadcasts to every shard and reduces the results;
``polling=ANY`` routes to one shard; endpoint discovery aggregates over
shards.
"""

import asyncio
from typing import Any, Dict, List, Optional, Sequence

from marie_tpu.enums import PollingType
from marie_tpu.logging_core import MarieLogger
from marie_tpu.serve.networking import GrpcConnectionPool
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.request import DataRequest


class HeaderRequestHandler:
    def __init__(
        self,
        shard_addresses: Dict[int, List[str]],
        polling: PollingType = PollingType.ALL,
        name: str = "head",
        timeout: Optional[float] = None,
        **kwargs,
    ):
        self.logger = MarieLogger(f"head/{name}")
        self.polling = polling
        self.timeout = timeout
        self.connection_pool = GrpcConnectionPool()
        self.shards = sorted(shard_addresses)
        for shard_id, addresses in shard_addresses.items():
            for addr in addresses:
                self.connection_pool.add_connection(f"shard-{shard_id}", addr)
        self._rr = 0
        self._endpoints_cache: Optional[Dict[str, Any]] = None

    def _polling_for(self, endpoint: str) -> PollingType:
        """Resolve the polling mode for an endpoint: a plain PollingType
        applies to everything; a dict maps endpoint → mode with ``'*'``
        as the default (reference per-endpoint polling,
        ``polling={'/index': 'ANY', '*': 'ALL'}``)."""
        polling = self.polling
        if isinstance(polling, dict):
            mode = polling.get(endpoint, polling.get("*", PollingType.ALL))
        else:
            mode = polling
        if isinstance(mode, str):
            mode = PollingType[mode.upper()]
        return mode

    async def process_data(self, requests: Sequence[DataRequest]) -> DataRequest:
        req = requests[0]
        endpoint_polling = self._polling_for(req.exec_endpoint)
        if endpoint_polling == PollingType.ANY:
            shard = self.shards[self._rr % len(self.shards)]
            self._rr += 1
            return await self.connection_pool.send_requests_once(
                [req], deployment=f"shard-{shard}", timeout=self.timeout
            )
        # ALL: broadcast + reduce
        responses = await asyncio.gather(
            *(
                self.connection_pool.send_requests_once(
                    [_clone(req)], deployment=f"shard-{s}", timeout=self.timeout
                )
                for s in self.shards
            )
        )
        for r in responses:
            if r.is_error():
                return r
        merged = WorkerRequestHandler.reduce_docs(responses)
        WorkerRequestHandler.merge_routes(responses)
        final = responses[0]
        final.docs = merged
        return final

    async def endpoints(self) -> Dict[str, Any]:
        """Proxy endpoint discovery to the shards (reference head
        endpoint_discovery forwards to a worker) so a gateway filtering
        by endpoint sees the REAL surface behind this head.  Falls back
        to the ``/default`` catch-all when no shard answers — permissive,
        never filters a reachable deployment out."""
        if self._endpoints_cache is not None:
            return self._endpoints_cache
        for s in self.shards:
            try:
                info = await self.connection_pool.send_discover_endpoint(
                    f"shard-{s}", timeout=5.0
                )
                self._endpoints_cache = info
                return info
            except Exception:  # noqa: BLE001 — try the next shard
                continue
        return {"endpoints": ["/default"], "write_endpoints": [], "schemas": {}}

    def info(self) -> Dict[str, Any]:
        from marie_tpu.helper import get_full_version

        return get_full_version()

    async def close(self) -> None:
        await self.connection_pool.close()


def _clone(req: DataRequest) -> DataRequest:
    req.flush()
    clone = DataRequest()
    clone.proto.CopyFrom(req.proto)
    return clone
