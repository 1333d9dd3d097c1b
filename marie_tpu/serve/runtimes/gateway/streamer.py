"""GatewayStreamer — prefetch-limited request streaming through the DAG.

Parity with the reference's ``GatewayStreamer``/``RequestStreamer``
(``/root/reference/marie/serve/runtimes/gateway/streamer.py:44``,
``marie/serve/stream/__init__.py:28``): at most ``prefetch`` requests in
flight; an ``_ExecutorStreamer``-style helper addresses one deployment
directly.
"""

import asyncio
from typing import AsyncIterator, Dict, List, Optional, Sequence

from marie_tpu.logging_core import MarieLogger
from marie_tpu.serve.networking import GrpcConnectionPool
from marie_tpu.serve.runtimes.gateway.topology_graph import TopologyGraph
from marie_tpu.types.request import DataRequest


class GatewayStreamer:
    def __init__(
        self,
        graph_representation: Dict[str, List[str]],
        executor_addresses: Dict[str, List[str]],
        prefetch: int = 0,
        timeout: Optional[float] = None,
        floating_deployments: Optional[Sequence[str]] = None,
        balancer: str = "round_robin",
        node_conditions=None,
    ):
        self.logger = MarieLogger("GatewayStreamer")
        self.topology = TopologyGraph(
            graph_representation,
            floating_deployments=floating_deployments,
            node_conditions=node_conditions,
        )
        self.connection_pool = GrpcConnectionPool(balancer=balancer)
        for deployment, addresses in executor_addresses.items():
            for addr in addresses:
                self.connection_pool.add_connection(deployment, addr)
        self.prefetch = prefetch
        self.timeout = timeout
        self._sem = (
            asyncio.Semaphore(prefetch) if prefetch and prefetch > 0 else None
        )

    # ------------------------------------------------------------------
    async def process_single_data(self, request: DataRequest) -> DataRequest:
        if self._sem is not None:
            async with self._sem:
                return await self.topology.stream(
                    request, self.connection_pool, self.timeout
                )
        return await self.topology.stream(
            request, self.connection_pool, self.timeout
        )

    async def _process_guarded(self, request: DataRequest) -> DataRequest:
        """Per-request error containment: a transport/DAG failure becomes
        an error-status response instead of aborting the whole stream
        (reference handle_request semantics — sibling in-flight requests
        of a bidi stream must not die with it)."""
        try:
            return await self.process_single_data(request)
        except Exception as ex:  # noqa: BLE001 — degrade per-request
            self.logger.error(f"request failed in DAG stream: {ex!r}")
            request.add_exception(ex)
            return request

    async def stream(
        self,
        request_iterator: AsyncIterator[DataRequest],
        results_in_order: bool = False,
    ) -> AsyncIterator[DataRequest]:
        """Streaming with prefetch-limited in-flight requests.  Results
        come in completion order by default; ``results_in_order`` yields
        them in submission order while still processing concurrently
        (reference RequestStreamer ``results_in_order``,
        marie/serve/runtimes/gateway/streamer.py:222)."""
        if results_in_order:
            ordered: asyncio.Queue = asyncio.Queue()
            done_marker = object()

            async def feed_ordered():
                async for req in request_iterator:
                    ordered.put_nowait(
                        asyncio.create_task(self._process_guarded(req))
                    )
                ordered.put_nowait(done_marker)

            feeder = asyncio.create_task(feed_ordered())
            try:
                while True:
                    item = await ordered.get()
                    if item is done_marker:
                        break
                    yield await item
            finally:
                feeder.cancel()
            return
        queue: asyncio.Queue = asyncio.Queue()
        n_pending = 0
        done_feeding = asyncio.Event()

        async def feed():
            nonlocal n_pending
            async for req in request_iterator:
                n_pending += 1
                task = asyncio.create_task(self._process_guarded(req))
                task.add_done_callback(lambda t: queue.put_nowait(t))
            done_feeding.set()

        feeder = asyncio.create_task(feed())
        try:
            while True:
                if done_feeding.is_set() and n_pending == 0:
                    break
                get_task = asyncio.create_task(queue.get())
                wait_done = asyncio.create_task(done_feeding.wait())
                done, pending = await asyncio.wait(
                    [get_task, wait_done], return_when=asyncio.FIRST_COMPLETED
                )
                if get_task in done:
                    task = get_task.result()
                    n_pending -= 1
                    ex = task.exception()
                    if ex is not None:
                        raise ex
                    yield task.result()
                else:
                    get_task.cancel()
                for p in pending:
                    if p is not get_task:
                        p.cancel()
        finally:
            feeder.cancel()

    # ------------------------------------------------------------------
    def update_topology(
        self,
        graph_representation: Dict[str, List[str]],
        executor_addresses: Dict[str, List[str]],
        floating_deployments: Optional[Sequence[str]] = None,
    ) -> None:
        """Rebuild routing live (the discovery-driven elasticity path —
        reference ``update_gateway_streamer``, marie_gateway.py:832)."""
        self.topology = TopologyGraph(
            graph_representation, floating_deployments=floating_deployments
        )
        # refresh connections (keep existing channels where addresses match)
        for deployment, addresses in executor_addresses.items():
            existing = set(self.connection_pool.addresses(deployment))
            for addr in addresses:
                if addr not in existing:
                    self.connection_pool.add_connection(deployment, addr)
            for addr in existing - set(addresses):
                self.connection_pool.remove_connection(deployment, addr)

    async def close(self) -> None:
        await self.connection_pool.close()


class ExecutorStreamer:
    """Address ONE deployment directly (reference ``_ExecutorStreamer:441``)."""

    def __init__(self, connection_pool: GrpcConnectionPool, executor_name: str):
        self.connection_pool = connection_pool
        self.executor_name = executor_name

    async def post(self, docs, exec_endpoint: str = "/", parameters=None):
        req = DataRequest.from_docs(
            docs, endpoint=exec_endpoint, parameters=parameters
        )
        resp = await self.connection_pool.send_requests_once(
            [req], deployment=self.executor_name
        )
        return resp.docs
