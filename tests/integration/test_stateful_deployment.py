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
