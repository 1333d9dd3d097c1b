"""Adversarial worker-handler cases — the edge behaviour the reference's
1.5k-line handler accumulated over years, pinned here as tests
(reference: marie/serve/runtimes/worker/request_handling.py:944 doc-matrix
reduce, :1460 job records, error envelopes via add_exception).
"""

import asyncio

from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests
from marie_tpu.serve.runtimes.worker.request_handling import WorkerRequestHandler
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest
from tests.integration.executors import EchoExecutor


class DictExecutor(BaseExecutor):
    @requests(on="/stats")
    def stats(self, docs, parameters, **kwargs):
        return {"n": len(docs)}


def _req(endpoint="/echo", params=None, texts=("a",), ids=None):
    docs = DocumentArray(
        [
            Document(id=ids[i], text=t) if ids else Document(text=t)
            for i, t in enumerate(texts)
        ]
    )
    return DataRequest.from_docs(docs, endpoint=endpoint, parameters=params or {})


def test_matrix_reduce_dedupes_by_id_first_wins():
    """Doc-matrix reduce: duplicate ids across predecessor requests keep
    the FIRST occurrence, order preserved request-major."""
    r1 = _req(texts=("a", "b"), ids=("d1", "d2"))
    r2 = _req(texts=("B", "c"), ids=("d2", "d3"))
    merged = WorkerRequestHandler.reduce_docs([r1, r2])
    assert [d.id for d in merged] == ["d1", "d2", "d3"]
    assert [d.text for d in merged] == ["a", "b", "c"]  # first d2 wins


def test_matrix_request_processes_merged_docs():
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    r1 = _req(texts=("x",), ids=("i1",))
    r2 = _req(texts=("y",), ids=("i2",))
    resp = asyncio.run(handler.process_data([r1, r2]))
    assert sorted(d.text for d in resp.docs) == ["echo:x", "echo:y"]


def test_target_executor_mismatch_passes_through_unmodified():
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    req = _req(texts=("keep",))
    req.target_executor = "somebody-else"
    resp = asyncio.run(handler.process_data([req]))
    assert [d.text for d in resp.docs] == ["keep"]  # executor never ran
    assert len(resp.routes) == 0  # pass-through adds no route


def test_unknown_endpoint_skips_executor():
    """Endpoint mismatch without a /default endpoint SKIPS the executor —
    docs pass through unchanged so only the flow hops that serve the
    endpoint run (reference request_handling.py:714-726)."""
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    resp = asyncio.run(handler.process_data([_req(endpoint="/no-such",
                                                  texts=("keep",))]))
    assert not resp.is_error()
    assert [d.text for d in resp.docs] == ["keep"]


def test_executor_exception_envelope_names_executor():
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    resp = asyncio.run(handler.process_data([_req(endpoint="/boom")]))
    assert resp.is_error()
    assert "intentional failure" in resp.status.description
    assert resp.status.exception.executor == "EchoExecutor"


def test_route_records_start_and_end_times():
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    resp = asyncio.run(handler.process_data([_req()]))
    assert len(resp.routes) == 1
    r = resp.routes[0]
    assert r.executor == "adv-echo"
    start = r.start_time.ToDatetime()
    end = r.end_time.ToDatetime()
    assert r.start_time.seconds and start <= end


def test_dict_results_accumulate_per_executor():
    """Dict returns from multiple workers ride in parameters.__results__
    keyed by executor name — a second worker must not clobber the first."""
    h1 = WorkerRequestHandler(uses=DictExecutor, name="w1")
    h2 = WorkerRequestHandler(uses=DictExecutor, name="w2")
    req = _req(endpoint="/stats", texts=("a", "b"))
    resp = asyncio.run(h1.process_data([req]))
    resp = asyncio.run(h2.process_data([resp]))
    results = resp.parameters["__results__"]
    assert results["w1"] == {"n": 2} and results["w2"] == {"n": 2}
    # docs unchanged by dict-returning endpoints
    assert [d.text for d in resp.docs] == ["a", "b"]


def test_empty_request_is_valid():
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    resp = asyncio.run(handler.process_data([_req(texts=())]))
    assert len(resp.docs) == 0
    assert not resp.is_error()


def test_target_executor_regex_matches_worker():
    """target_executor is a REGEX over executor names (reference gateway
    topology_graph.py:449): a pattern covering this worker's name runs
    the endpoint; a non-matching pattern passes through."""
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    req = _req(texts=("hit",))
    req.target_executor = "adv-.*"
    resp = asyncio.run(handler.process_data([req]))
    assert [d.text for d in resp.docs] == ["echo:hit"]

    req2 = _req(texts=("miss",))
    req2.target_executor = "^other-.*"
    resp2 = asyncio.run(handler.process_data([req2]))
    assert [d.text for d in resp2.docs] == ["miss"]


def test_target_executor_malformed_regex_falls_back_to_exact():
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv[echo")
    req = _req(texts=("x",))
    req.target_executor = "adv[echo"  # invalid regex, exact name match
    resp = asyncio.run(handler.process_data([req]))
    assert [d.text for d in resp.docs] == ["echo:x"]


def test_matrix_merge_routes_dedupes_by_executor():
    """Routes from every predecessor request survive the matrix reduce,
    deduped by executor (reference merge_routes, request_handling.py:855)."""
    handler = WorkerRequestHandler(uses=EchoExecutor, name="adv-echo")
    r1 = _req(texts=("x",), ids=("i1",))
    r1.add_route("upstream-a", "2026-08-19T00:00:00+00:00", "2026-08-19T00:00:01+00:00")
    r2 = _req(texts=("y",), ids=("i2",))
    r2.add_route("upstream-b", "2026-08-19T00:00:00+00:00", "2026-08-19T00:00:01+00:00")
    r2.add_route("upstream-a", "2026-08-19T00:00:00+00:00", "2026-08-19T00:00:01+00:00")  # duplicate executor
    resp = asyncio.run(handler.process_data([r1, r2]))
    names = [r.executor for r in resp.routes]
    assert names.count("upstream-a") == 1
    assert "upstream-b" in names
    assert "adv-echo" in names  # this hop appended its own route


def test_dynamic_batching_isolates_parameter_sets():
    """Requests with DIFFERENT parameters never share a merged batch —
    each runs with its own params (reference param-keyed batch queues,
    request_handling.py:739-753)."""
    from tests.integration.executors import ParamBatchExecutor

    handler = WorkerRequestHandler(uses=ParamBatchExecutor, name="pb")

    async def run():
        ra = _req(endpoint="/pbatch", params={"v": "A"}, texts=("a1", "a2"))
        rb = _req(endpoint="/pbatch", params={"v": "B"}, texts=("b1", "b2"))
        return await asyncio.gather(
            handler.process_data([ra]), handler.process_data([rb])
        )

    res_a, res_b = asyncio.run(run())
    assert [d.tags["seen"] for d in res_a.docs] == ["A", "A"]
    assert [d.tags["seen"] for d in res_b.docs] == ["B", "B"]

    async def run_same():
        r1 = _req(endpoint="/pbatch", params={"v": "X"}, texts=("x1",))
        r2 = _req(endpoint="/pbatch", params={"v": "X"}, texts=("x2",))
        return await asyncio.gather(
            handler.process_data([r1]), handler.process_data([r2])
        )

    s1, s2 = asyncio.run(run_same())
    # equal params DO share a batch (both saw batch size 2)
    assert int(s1.docs[0].tags["batch"]) == 2
    assert int(s2.docs[0].tags["batch"]) == 2
