"""Replica-kill failover: the gateway connection pool must ride through
a worker pod dying mid-traffic (retry + failover to the live replica —
reference connection-pool UNAVAILABLE retry semantics,
marie/serve/networking/__init__.py:399)."""

import asyncio

from marie_tpu.clients import Client
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document
from tests.integration.executors import UpperExecutor


def test_gateway_survives_replica_kill():
    flow = Flow().add(uses=UpperExecutor, name="up", replicas=2)
    with flow:
        client = Client(port=flow.port_gateway)
        # warm traffic across both replicas
        docs = client.post("/default", [Document(text=f"w{i}") for i in range(4)])
        assert sorted(d.text for d in docs) == ["W0", "W1", "W2", "W3"]

        # kill one worker pod hard (simulated crash, not graceful stop)
        dep = flow._deployments["up"]
        victim = dep.pods[0]
        victim._process.kill()
        victim._process.join(5)
        assert not victim.is_alive()

        # every subsequent request must still succeed via the survivor
        for i in range(6):
            docs = client.post("/default", [Document(text=f"x{i}")])
            assert docs[0].text == f"X{i}", f"request {i} failed after kill"


def test_all_replicas_dead_is_contained_error():
    """With every replica dead, the gateway returns an error envelope
    (per-request containment) instead of hanging or crashing."""
    flow = Flow().add(uses=UpperExecutor, name="up", replicas=1)
    with flow:
        client = Client(port=flow.port_gateway)
        assert client.post("/default", [Document(text="a")])[0].text == "A"

        for pod in flow._deployments["up"].pods:
            pod._process.kill()
            pod._process.join(5)

        resp = client.post(
            "/default", [Document(text="b")],
            return_responses=True, continue_on_error=True,
        )
        assert resp.is_error()
        # and the client's default contract still raises BadServer
        import pytest as _pytest

        from marie_tpu.excepts import BadServer

        with _pytest.raises(BadServer):
            client.post("/default", [Document(text="c")])


def test_sharded_deployment_survives_replica_kill():
    """Sharded deployment (real head pod, polling=ALL): killing one
    replica of a shard must not break the broadcast+reduce path — the
    head's pool fails over to the shard's surviving replica."""
    flow = Flow().add(uses=UpperExecutor, name="sh", shards=2, replicas=2)
    with flow:
        client = Client(port=flow.port_gateway)
        docs = client.post(
            "/default", [Document(id=f"d{i}", text=f"a{i}") for i in range(3)]
        )
        # ALL-polling reduce dedupes by id: 3 docs in, 3 docs out
        assert sorted(d.text for d in docs) == ["A0", "A1", "A2"]

        # kill shard-0's first replica
        victim = flow._deployments["sh"].pods[0]
        victim._process.kill()
        victim._process.join(5)

        for i in range(4):
            docs = client.post("/default", [Document(id=f"k{i}", text=f"b{i}")])
            assert docs[0].text == f"B{i}", f"post {i} failed after shard-replica kill"
