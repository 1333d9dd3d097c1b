"""TopologyGraph — the deployment DAG the gateway streams requests through.

Parity with the reference
(``/root/reference/marie/serve/runtimes/gateway/graph/topology_graph.py:31``):
built from a graph description {node: [outgoing...]}, with
``start-gateway``/``end-gateway`` virtual nodes, floating nodes (not
awaited for the response), and per-node doc reduce when a node has
multiple predecessors.
"""

import asyncio
import copy
from typing import Any, Dict, List, Optional, Sequence

from marie_tpu.serve.networking import GrpcConnectionPool
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.request import DataRequest

START = "start-gateway"
END = "end-gateway"


class TopologyGraph:
    def __init__(
        self,
        graph_description: Dict[str, List[str]],
        deployments_metadata: Optional[Dict[str, Any]] = None,
        floating_deployments: Optional[Sequence[str]] = None,
        node_conditions: Optional[Dict[str, Dict[str, Any]]] = None,
    ):
        self.graph = {k: list(v) for k, v in graph_description.items()}
        self.floating = set(floating_deployments or [])
        self.node_conditions = dict(node_conditions or {})
        # lazily-discovered endpoint sets per node (reference populates
        # node.endpoints via JinaDiscoverEndpointsRPC and skips nodes
        # that don't serve the requested endpoint, topology_graph.py:435)
        self._endpoints_cache: Dict[str, Optional[set]] = {}
        # normalize: collect all node names
        names = set()
        for src, dsts in self.graph.items():
            if src not in (START, END):
                names.add(src)
            for d in dsts:
                if d not in (START, END):
                    names.add(d)
        self.nodes = sorted(names)
        self._preds: Dict[str, List[str]] = {n: [] for n in self.nodes}
        for src, dsts in self.graph.items():
            for d in dsts:
                if d in self._preds and src not in (START,):
                    self._preds[d].append(src)
        self._validate()

    def _validate(self) -> None:
        from marie_tpu.excepts import FlowTopologyError

        # cycle check via Kahn's algorithm
        indeg = {n: 0 for n in self.nodes}
        for src, dsts in self.graph.items():
            for d in dsts:
                if d in indeg and src not in (START,):
                    indeg[d] += 1
        queue = [n for n, d in indeg.items() if d == 0]
        seen = 0
        while queue:
            n = queue.pop()
            seen += 1
            for d in self.graph.get(n, []):
                if d in indeg:
                    indeg[d] -= 1
                    if indeg[d] == 0:
                        queue.append(d)
        if seen != len(self.nodes):
            raise FlowTopologyError("flow graph contains a cycle")

    @property
    def origin_nodes(self) -> List[str]:
        return [n for n in self.graph.get(START, []) if n not in (END,)]

    def predecessors(self, node: str) -> List[str]:
        return self._preds.get(node, [])

    def successors(self, node: str) -> List[str]:
        return [d for d in self.graph.get(node, []) if d != END]

    def ends(self) -> List[str]:
        """Nodes that feed the response (edge to END or no successors),
        excluding floating nodes."""
        out = []
        for n in self.nodes:
            dsts = self.graph.get(n, [])
            if (END in dsts or not dsts) and n not in self.floating:
                out.append(n)
        return out

    # ------------------------------------------------------------------
    async def stream(
        self,
        request: DataRequest,
        connection_pool: GrpcConnectionPool,
        timeout: Optional[float] = None,
    ) -> DataRequest:
        """Send one request through the DAG and return the merged response."""
        results: Dict[str, asyncio.Task] = {}

        async def run_node(node: str) -> DataRequest:
            preds = self.predecessors(node)
            if preds:
                pred_resps = [await results[p] for p in preds]
                pred_resps = [r for r in pred_resps if r is not None]
                if any(r.is_error() for r in pred_resps):
                    return next(r for r in pred_resps if r.is_error())
                if len(pred_resps) > 1:
                    merged_docs = WorkerRequestHandler.reduce_docs(pred_resps)
                    WorkerRequestHandler.merge_routes(pred_resps)
                    req = _clone(pred_resps[0])
                    req.docs = merged_docs
                else:
                    req = pred_resps[0]
            else:
                req = _clone(request)

            # target_executor is a REGEX over node names: non-matching
            # nodes are skipped (docs pass through unchanged) without the
            # request ever leaving the gateway (reference
            # topology_graph.py:449 `re.match(target_executor_pattern, ...)`)
            if not _targets(request.target_executor, node):
                return req

            # endpoint filtering: skip nodes that don't serve the
            # requested endpoint (and have no /default catch-all) before
            # any network send (reference topology_graph.py:435-441)
            eps = await self._node_endpoints(node, connection_pool)
            if (
                eps is not None
                and request.exec_endpoint not in eps
                and "/default" not in eps
            ):
                return req

            condition = self.node_conditions.get(node)
            if condition:
                from marie_tpu.serve.runtimes.gateway.conditions import doc_matches
                from marie_tpu.types.docs import DocumentArray

                matched = DocumentArray(
                    [d for d in req.docs if doc_matches(d, condition)]
                )
                bypassed = [d for d in req.docs if not doc_matches(d, condition)]
                if not matched:
                    return req  # node skipped entirely
                sub = _clone(req)
                sub.docs = matched
                resp = await connection_pool.send_requests_once(
                    [sub], deployment=node, timeout=timeout
                )
                if bypassed and not resp.is_error():
                    merged = DocumentArray(list(resp.docs) + bypassed)
                    resp.docs = merged
                return resp
            return await connection_pool.send_requests_once(
                [req], deployment=node, timeout=timeout
            )

        # schedule in topological order (tasks await predecessors)
        for node in self._topo_order():
            results[node] = asyncio.create_task(run_node(node))

        end_nodes = self.ends()
        responses = [await results[n] for n in end_nodes]
        # floating nodes run but are not awaited for the response;
        # keep references alive so exceptions surface in logs
        for n in self.nodes:
            if n in self.floating:
                results[n].add_done_callback(_log_floating_error)

        for r in responses:
            if r.is_error():
                return r
        if len(responses) > 1:
            merged = WorkerRequestHandler.reduce_docs(responses)
            WorkerRequestHandler.merge_routes(responses)
            final = responses[0]
            final.docs = merged
            return final
        return responses[0]

    async def _node_endpoints(
        self, node: str, connection_pool: GrpcConnectionPool
    ) -> Optional[set]:
        """Endpoint set a node serves, discovered once per topology build
        via the endpoint-discovery RPC.  ``None`` (pool without discovery
        support, or discovery failed) means "unknown — send anyway"; the
        worker-side endpoint-mismatch skip remains the safety net."""
        if node in self._endpoints_cache:
            return self._endpoints_cache[node]
        discover = getattr(connection_pool, "send_discover_endpoint", None)
        eps: Optional[set] = None
        if discover is not None:
            try:
                info = await discover(node)
                eps = set(info.get("endpoints", []))
            except Exception:  # noqa: BLE001 — discovery is best-effort
                eps = None
        self._endpoints_cache[node] = eps
        return eps

    def _topo_order(self) -> List[str]:
        order: List[str] = []
        seen = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            seen.add(n)
            for p in self.predecessors(n):
                visit(p)
            order.append(n)

        for n in self.nodes:
            visit(n)
        return order


def _targets(pattern: str, node: str) -> bool:
    """True iff the request's ``target_executor`` pattern addresses this
    node.  Empty pattern targets everything; a malformed regex falls back
    to exact-name comparison."""
    import re

    if not pattern:
        return True
    try:
        return re.match(pattern, node) is not None
    except re.error:
        return pattern == node


def _clone(req: DataRequest) -> DataRequest:
    clone = DataRequest()
    clone.proto.CopyFrom(req.proto)
    clone.docs = copy.deepcopy(req.docs)
    clone.parameters = copy.deepcopy(req.parameters)
    return clone


def _log_floating_error(task: asyncio.Task) -> None:
    if task.cancelled():
        return
    ex = task.exception()
    if ex is not None:
        from marie_tpu.logging_core import default_logger

        default_logger.error(f"floating node failed: {ex!r}")
