"""Stateful replicated executors over RAFT.

Parity with the reference's stateful deployment path
(``/root/reference/marie/serve/executors/run.py:16 run_raft`` +
``Deployment(stateful=True)``): writes go through the leader's log; every
replica's FSM applies committed DataRequests to its local executor, so
all replicas converge on the same state.  Followers answer "not the
leader" and clients retry against the next replica (the reference's
client-side follow-up, ``networking/__init__.py:399-405``).
"""

import asyncio
import threading
from typing import Optional

from marie_tpu.logging_core import MarieLogger
from marie_tpu.serve.consensus import RaftNode
from marie_tpu.types.request import DataRequest


class NotTheLeader(Exception):
    def __init__(self, leader_id: str = ""):
        self.leader_id = leader_id
        super().__init__(f"not the leader (leader={leader_id or 'unknown'})")


class StatefulExecutorAdapter:
    """Wraps a WorkerRequestHandler with RAFT-replicated writes.

    ``process_write`` submits the serialized request to the raft log and
    waits for local application; committed entries are applied to the
    executor on EVERY replica (in log order, single-threaded).
    """

    def __init__(self, handler, node_id: str, bind_addr: str):
        self.logger = MarieLogger(f"stateful/{node_id}")
        self.handler = handler
        self._applied_index = 0
        self._apply_events: dict = {}
        self._results: dict = {}
        self._lock = threading.Lock()
        self._loop = asyncio.new_event_loop()
        self._loop_thread = threading.Thread(
            target=self._loop.run_forever, daemon=True
        )
        self._loop_thread.start()
        self.node = RaftNode(node_id, bind_addr, apply_fn=self._apply)

    # --- FSM ----------------------------------------------------------
    def _apply(self, data: bytes, index: int) -> None:
        """Committed log entry -> execute on the local executor (ordered)."""
        req = DataRequest.from_bytes(data)
        fut = asyncio.run_coroutine_threadsafe(
            self.handler.process_data([req]), self._loop
        )
        result = fut.result(timeout=60)
        with self._lock:
            self._applied_index = index
            self._results[index] = result
            # bounded result stash: never evict an index a writer still
            # awaits (events stay registered until the writer collects),
            # with a hard cap so followers (no writers) stay bounded
            min_awaited = min(self._apply_events) if self._apply_events else index + 1
            for old in sorted(self._results):
                if len(self._results) <= 64 or old >= min_awaited:
                    break
                self._results.pop(old)
            while len(self._results) > 1024:
                self._results.pop(min(self._results))
            ev = self._apply_events.get(index)
        if ev is not None:
            ev.set()

    def take_result(self, index: int):
        with self._lock:
            return self._results.pop(index, None)

    # --- write path ---------------------------------------------------
    def process_write(self, request: DataRequest, timeout: float = 30.0):
        """Replicate + apply a write, returning (index, local result).

        Raises NotTheLeader on followers; raises RuntimeError when the
        entry applied but its result is missing (never silent)."""
        idx = self.node.submit(request.to_bytes())
        if idx == 0:
            raise NotTheLeader(self.node.leader_id)
        ev = threading.Event()
        with self._lock:
            if idx in self._results:
                return idx, self._results.pop(idx)
            self._apply_events[idx] = ev
        try:
            if not ev.wait(timeout):
                raise TimeoutError(f"entry {idx} not applied within {timeout}s")
            result = self.take_result(idx)
            if result is None:
                raise RuntimeError(
                    f"entry {idx} applied but its result was dropped"
                )
            return idx, result
        finally:
            with self._lock:
                self._apply_events.pop(idx, None)

    # --- lifecycle ----------------------------------------------------
    def start(self) -> "StatefulExecutorAdapter":
        self.node.start()
        return self

    def add_voter(self, node_id: str, addr: str) -> None:
        self.node.add_voter(node_id, addr)

    @property
    def is_leader(self) -> bool:
        return self.node.is_leader

    def shutdown(self) -> None:
        self.node.shutdown()
        self._loop.call_soon_threadsafe(self._loop.stop)
        self._loop_thread.join(timeout=5)


class StatefulReplicatedHandler:
    """Request-handler wrapper for RAFT-replicated worker pods.

    Write requests replicate through the log and apply on every replica;
    followers answer with an error envelope carrying the leader hint so
    the connection pool retries the next replica (reference "not the
    leader" follow-up, networking/__init__.py:399-405).  Discovery/info
    endpoints pass through locally.
    """

    def __init__(self, handler, node_id: str, bind_addr: str, peers=None):
        self.inner = handler
        self.logger = MarieLogger(f"stateful-handler/{node_id}")
        self.adapter = StatefulExecutorAdapter(handler, node_id, bind_addr)
        for peer_id, addr in peers or []:
            self.adapter.add_voter(peer_id, addr)
        self.adapter.start()

    async def process_data(self, requests):
        import asyncio

        req = requests[0]
        # only @write endpoints replicate through the consensus log;
        # reads execute locally on ANY replica (reference @write
        # semantics, serve/executors/decorators.py:94 — the scalability
        # point of replicated state).  Executors that declare no write
        # endpoints keep the conservative replicate-everything behavior.
        writes = set(self.inner.executor.write_endpoints)
        if writes and req.exec_endpoint not in writes:
            return await self.inner.process_data(requests)
        try:
            loop = asyncio.get_running_loop()
            _, result = await loop.run_in_executor(
                None, lambda: self.adapter.process_write(req)
            )
            # the FSM applied the request on this (leader) replica too —
            # return its local execution result
            return result
        except NotTheLeader as ex:
            req.add_exception(ex, executor="raft")
            return req
        except (TimeoutError, RuntimeError) as ex:
            self.logger.error(f"replicated write failed: {ex!r}")
            req.add_exception(ex, executor="raft")
            return req

    def endpoints(self):
        return self.inner.endpoints()

    def info(self):
        info = self.inner.info()
        info["raft"] = self.adapter.node.get_configuration()
        return info

    def snapshot(self, snapshot_file: str) -> None:
        self.inner.snapshot(snapshot_file)

    def restore(self, snapshot_file: str) -> None:
        self.inner.restore(snapshot_file)

    async def close(self) -> None:
        self.adapter.shutdown()
        await self.inner.close()
