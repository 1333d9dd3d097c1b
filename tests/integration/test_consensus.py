"""C++ RAFT module tests (reference parity: stateful replicated executors,
SURVEY.md §3.5)."""

import time

import pytest

from marie_tpu.helper import random_port
from marie_tpu.serve.consensus import LEADER, RaftNode


def _wait(cond, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if cond():
            return True
        time.sleep(0.05)
    return False


@pytest.fixture
def cluster3():
    ports = [random_port() for _ in range(3)]
    addrs = [f"127.0.0.1:{p}" for p in ports]
    nodes = [RaftNode(f"n{i}", addrs[i]) for i in range(3)]
    for i, n in enumerate(nodes):
        for j, a in enumerate(addrs):
            if i != j:
                n.add_voter(f"n{j}", a)
    for n in nodes:
        n.start()
    yield nodes
    for n in nodes:
        n.shutdown()


def test_single_node_self_elects_and_commits():
    node = RaftNode("solo", f"127.0.0.1:{random_port()}")
    node.start()
    try:
        assert _wait(lambda: node.is_leader)
        idx = node.submit(b"hello")
        assert idx == 1
        assert _wait(lambda: node.applied == [b"hello"])
    finally:
        node.shutdown()


def test_three_node_election_and_replication(cluster3):
    nodes = cluster3
    assert _wait(lambda: sum(n.is_leader for n in nodes) == 1)
    leader = next(n for n in nodes if n.is_leader)

    for k in range(3):
        assert leader.submit(f"e{k}".encode()) > 0
    assert _wait(lambda: all(len(n.applied) == 3 for n in nodes))
    for n in nodes:
        assert n.applied == [b"e0", b"e1", b"e2"]  # same order everywhere

    # follower rejects writes (reference "not the leader" semantics)
    follower = next(n for n in nodes if not n.is_leader)
    assert follower.submit(b"nope") == 0

    cfg = leader.get_configuration()
    assert len(cfg["servers"]) == 3
    assert cfg["leader"] == leader.node_id


def test_leader_failover(cluster3):
    nodes = cluster3
    assert _wait(lambda: sum(n.is_leader for n in nodes) == 1)
    leader = next(n for n in nodes if n.is_leader)
    leader.submit(b"before")
    assert _wait(lambda: all(len(n.applied) == 1 for n in nodes))

    old_term = leader.term
    leader.shutdown()
    survivors = [n for n in nodes if n is not leader]
    nodes.remove(leader)  # fixture teardown must skip it

    assert _wait(lambda: any(n.is_leader for n in survivors), timeout=15)
    new_leader = next(n for n in survivors if n.is_leader)
    assert new_leader.term > old_term
    assert new_leader.submit(b"after") > 0
    assert _wait(lambda: all(n.applied[-1] == b"after" for n in survivors))


def test_stateful_adapter_replicates_executor_state():
    from marie_tpu.serve.consensus.stateful import (
        NotTheLeader,
        StatefulExecutorAdapter,
    )
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )
    from marie_tpu.types.docs import Document, DocumentArray
    from marie_tpu.types.request import DataRequest
    from tests.integration.executors import SnapshotExecutor

    ports = [random_port() for _ in range(3)]
    addrs = [f"127.0.0.1:{p}" for p in ports]
    adapters = []
    for i in range(3):
        handler = WorkerRequestHandler(executor=SnapshotExecutor(), name="c")
        a = StatefulExecutorAdapter(handler, f"s{i}", addrs[i])
        for j, addr in enumerate(addrs):
            if j != i:
                a.add_voter(f"s{j}", addr)
        adapters.append(a)
    for a in adapters:
        a.start()
    try:
        assert _wait(lambda: sum(a.is_leader for a in adapters) == 1)
        leader = next(a for a in adapters if a.is_leader)
        follower = next(a for a in adapters if not a.is_leader)

        req = DataRequest.from_docs(
            DocumentArray([Document(text="x"), Document(text="y")]),
            endpoint="/incr",
        )
        leader.process_write(req)
        # every replica's executor saw the write
        assert _wait(
            lambda: all(
                a.handler.executor.counter == 2 for a in adapters
            ),
            timeout=10,
        )
        with pytest.raises(NotTheLeader):
            follower.process_write(
                DataRequest.from_docs(DocumentArray([Document()]), "/incr")
            )
    finally:
        for a in adapters:
            a.shutdown()


def test_log_compaction_and_snapshot_install():
    """VERDICT r2 #9: snapshot + truncate (hashicorp fsm.go:132/snapshot.go
    semantics) — 1k entries, snapshot compacts the log, a FRESH follower
    comes up from the snapshot blob + tail instead of replaying from 0."""
    n_entries = 1000
    leader = RaftNode("lead", f"127.0.0.1:{random_port()}")
    leader.start()
    try:
        assert _wait(lambda: leader.is_leader)
        for k in range(n_entries):
            assert leader.submit(f"e{k}".encode()) > 0
        assert _wait(lambda: len(leader.applied) == n_entries, timeout=20)

        # executor-state blob stands in for the snapshot RPC payload
        state = b"counter=" + str(n_entries).encode()
        sidx = leader.snapshot(state)
        assert sidx == n_entries
        assert leader.log_length == 0  # everything applied was compacted
        assert leader.snapshot_index == n_entries

        # a few post-snapshot entries form the live tail
        for k in range(5):
            leader.submit(f"tail{k}".encode())
        assert _wait(lambda: len(leader.applied) == n_entries + 5)
        assert leader.log_length < n_entries  # stays bounded

        # fresh follower: must restore from the blob, then apply the tail
        f_addr = f"127.0.0.1:{random_port()}"
        follower = RaftNode("f1", f_addr)
        follower.start()
        try:
            leader.add_voter("f1", f_addr)
            follower.add_voter("lead", leader.bind_addr)
            assert _wait(lambda: follower.restored == [state], timeout=15)
            assert _wait(
                lambda: [p.decode() for p in follower.applied]
                == [f"tail{k}" for k in range(5)],
                timeout=15,
            )
            assert follower.snapshot_index == n_entries
            assert follower.log_length < n_entries
        finally:
            follower.shutdown()
    finally:
        leader.shutdown()
