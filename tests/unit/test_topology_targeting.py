"""Gateway DAG targeting + route merging (reference
``topology_graph.py:449`` regex target_executor skip and
``request_handling.py:855`` merge_routes)."""

import asyncio

from marie_tpu.serve.runtimes.gateway.topology_graph import TopologyGraph
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest


class RecordingPool:
    """Fake connection pool: tags each doc with the deployments it
    visited and records every send."""

    def __init__(self):
        self.sent = []

    async def send_requests_once(self, requests, deployment, timeout=None):
        self.sent.append(deployment)
        req = requests[0]
        for d in req.docs:
            d.tags["path"] = d.tags.get("path", "") + f">{deployment}"
        req.add_route(
            deployment, "2026-08-19T00:00:00+00:00",
            "2026-08-19T00:00:01+00:00",
        )
        return req


def _req(target=""):
    req = DataRequest.from_docs(
        DocumentArray([Document(id="d0", text="x")]), endpoint="/e"
    )
    if target:
        req.target_executor = target
    return req


def _graph():
    # start -> a -> (b, c) -> d -> end
    return TopologyGraph(
        {
            "start-gateway": ["a"],
            "a": ["b", "c"],
            "b": ["d"],
            "c": ["d"],
            "d": ["end-gateway"],
        }
    )


def test_no_target_visits_all_nodes():
    pool = RecordingPool()
    resp = asyncio.run(_graph().stream(_req(), pool))
    assert sorted(pool.sent) == ["a", "b", "c", "d"]
    assert resp.docs[0].tags["path"].startswith(">a")


def test_regex_target_skips_nonmatching_nodes_at_gateway():
    pool = RecordingPool()
    resp = asyncio.run(_graph().stream(_req(target="^(a|b)$"), pool))
    # c and d are skipped WITHOUT a network send; docs still flow through
    assert sorted(pool.sent) == ["a", "b"]
    assert resp.docs[0].tags["path"] == ">a>b"


def test_exact_target_single_node():
    pool = RecordingPool()
    resp = asyncio.run(_graph().stream(_req(target="^c$"), pool))
    assert pool.sent == ["c"]
    assert resp.docs[0].tags["path"] == ">c"


def test_malformed_target_regex_degrades_to_exact():
    pool = RecordingPool()
    graph = TopologyGraph({"start-gateway": ["a[x"], "a[x": ["end-gateway"]})
    resp = asyncio.run(graph.stream(_req(target="a[x"), pool))
    assert pool.sent == ["a[x"]
    assert resp.docs[0].tags["path"] == ">a[x"


def test_join_merges_routes_from_both_branches():
    pool = RecordingPool()
    resp = asyncio.run(_graph().stream(_req(), pool))
    names = [r.executor for r in resp.routes]
    # every hop shows up exactly once despite the b/c join reduce
    for hop in ("a", "b", "c", "d"):
        assert names.count(hop) == 1, names


class DiscoveringPool(RecordingPool):
    """Pool that also answers endpoint discovery (like the real one)."""

    def __init__(self, endpoints_by_node):
        super().__init__()
        self.endpoints_by_node = endpoints_by_node
        self.discoveries = []

    async def send_discover_endpoint(self, deployment, timeout=None):
        self.discoveries.append(deployment)
        eps = self.endpoints_by_node.get(deployment)
        if eps is None:
            raise RuntimeError("discovery unavailable")
        return {"endpoints": list(eps), "write_endpoints": [], "schemas": {}}


def test_endpoint_filter_skips_nonserving_nodes():
    """Nodes that don't serve the requested endpoint (and have no
    /default) are skipped before any send (reference
    topology_graph.py:435-441)."""
    pool = DiscoveringPool({
        "a": ["/e"], "b": ["/other"], "c": ["/default"], "d": ["/e"],
    })
    resp = asyncio.run(_graph().stream(_req(), pool))
    # b doesn't serve /e and has no default -> skipped; c catches all
    assert sorted(pool.sent) == ["a", "c", "d"]
    names = [r.executor for r in resp.routes]
    assert "b" not in names


def test_endpoint_discovery_cached_per_topology():
    pool = DiscoveringPool({"a": ["/e"], "b": ["/e"], "c": ["/e"], "d": ["/e"]})
    g = _graph()
    asyncio.run(g.stream(_req(), pool))
    asyncio.run(g.stream(_req(), pool))
    # one discovery per node despite two requests
    assert sorted(pool.discoveries) == ["a", "b", "c", "d"]


def test_endpoint_discovery_failure_sends_anyway():
    pool = DiscoveringPool({"a": ["/e"], "b": None, "c": ["/e"], "d": ["/e"]})
    resp = asyncio.run(_graph().stream(_req(), pool))
    # discovery failed for b -> unknown -> sent anyway (worker-side skip
    # is the safety net)
    assert sorted(pool.sent) == ["a", "b", "c", "d"]
    assert resp is not None
