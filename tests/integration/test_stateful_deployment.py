"""Stateful replicated deployment (reference §3.5 RAFT write path)."""

import numpy as np
import pytest

from marie_tpu.clients import Client
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document
from tests.integration.executors import SnapshotExecutor


def test_stateful_replicas_converge_through_gateway():
    flow = Flow().add(
        uses=SnapshotExecutor, name="counter", replicas=3, stateful=True
    )
    with flow:
        client = Client(port=flow.port_gateway)
        # the gateway's pool round-robins replicas; followers answer "not
        # the leader" and the pool retries until the leader applies the
        # write — which replicates to ALL replicas, so the counter advances
        # exactly once per post no matter which replica answered
        for want in range(1, 6):
            docs = client.post("/incr", [Document()])
            assert int(docs[0].tags["counter"]) == want, (want, docs[0].tags)


def test_stateful_leader_kill_preserves_state():
    """Kill the bootstrap leader pod: the survivors re-elect, the pool
    retries through 'not the leader' + UNAVAILABLE, and the replicated
    counter CONTINUES from its pre-kill value (no state loss) —
    end-to-end analog of the consensus-level leader failover test."""
    import time

    flow = Flow().add(
        uses=SnapshotExecutor, name="counter", replicas=3, stateful=True
    )
    with flow:
        client = Client(port=flow.port_gateway)
        for want in range(1, 4):
            docs = client.post("/incr", [Document()])
            assert int(docs[0].tags["counter"]) == want

        # pod 0 bootstraps the cluster and starts as leader — kill it hard
        leader = flow._deployments["counter"].pods[0]
        leader._process.kill()
        leader._process.join(5)

        # survivors must re-elect and keep serving; allow generous time
        deadline = time.time() + 30
        got = None
        while time.time() < deadline:
            try:
                docs = client.post(
                    "/incr", [Document()], max_attempts=3,
                    initial_backoff=0.2,
                )
                got = int(docs[0].tags["counter"])
                break
            except Exception:
                time.sleep(0.5)
        assert got == 4, f"counter after failover: {got}"
        # and keeps advancing
        docs = client.post("/incr", [Document()])
        assert int(docs[0].tags["counter"]) == 5


def test_stateful_reads_served_locally_without_consensus():
    """Undecorated endpoints are READS: any replica answers from local
    state without a round through the RAFT log, while @write endpoints
    replicate (reference @write, serve/executors/decorators.py:94)."""
    flow = Flow().add(
        uses=SnapshotExecutor, name="counter", replicas=3, stateful=True
    )
    with flow:
        import time

        client = Client(port=flow.port_gateway)
        for _ in range(3):
            client.post("/incr", [Document()])
        # local reads are eventually consistent: followers apply the log
        # asynchronously, so poll until every replica the pool rotates
        # through has converged — but reads NEVER error with
        # "not the leader" (they would under replicate-everything)
        deadline = time.time() + 15
        streak = 0
        while time.time() < deadline and streak < 6:
            docs = client.post("/count", [Document()])
            got = int(docs[0].tags["counter"])
            assert got <= 3, f"read overshot the write count: {got}"
            streak = streak + 1 if got == 3 else 0
            if streak == 0:
                time.sleep(0.3)
        assert streak == 6, "replicas never converged on local reads"
