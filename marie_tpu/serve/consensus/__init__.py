"""RAFT consensus for replicated stateful executors — ctypes bindings over
the native C++ core (``native/raft/raft.cpp``).

Capability parity with the reference's Go/cgo ``jraft`` module
(``/root/reference/marie/serve/consensus/`` — ``run``/``add_voter``/
``get_configuration`` surface from ``jraft.go:30-57``; FSM forwards
committed DataRequests to the local executor, ``jina_raft/fsm.go:93``).
The shared library is built on demand with ``make`` (g++, no external
deps) and cached next to the source.
"""

import ctypes
import json
import os
import subprocess
import threading
from typing import Callable, List, Optional

from marie_tpu.logging_core import MarieLogger

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))),
    "native", "raft",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmarie_raft.so")

# NOTE: the data pointer MUST be c_void_p — c_char_p auto-converts to a
# Python bytes TRUNCATED AT THE FIRST NUL (protobuf payloads are full of
# them) and string_at then over-reads garbage past the truncated buffer.
_APPLY_CB = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_int, ctypes.c_longlong, ctypes.c_void_p
)

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> str:
    if not os.path.exists(_SO_PATH) or (
        os.path.getmtime(os.path.join(_NATIVE_DIR, "raft.cpp"))
        > os.path.getmtime(_SO_PATH)
    ):
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
    return _SO_PATH


def _load():
    global _lib
    with _lib_lock:
        if _lib is None:
            lib = ctypes.CDLL(_build_library())
            lib.raft_create.restype = ctypes.c_void_p
            lib.raft_create.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, _APPLY_CB, ctypes.c_void_p
            ]
            lib.raft_start.argtypes = [ctypes.c_void_p]
            lib.raft_add_voter.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p
            ]
            lib.raft_submit.restype = ctypes.c_longlong
            lib.raft_submit.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
            ]
            lib.raft_snapshot.restype = ctypes.c_longlong
            lib.raft_snapshot.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
            ]
            lib.raft_set_restore_cb.argtypes = [
                ctypes.c_void_p, _APPLY_CB, ctypes.c_void_p
            ]
            lib.raft_log_length.restype = ctypes.c_longlong
            lib.raft_log_length.argtypes = [ctypes.c_void_p]
            lib.raft_snapshot_index.restype = ctypes.c_longlong
            lib.raft_snapshot_index.argtypes = [ctypes.c_void_p]
            lib.raft_state.argtypes = [ctypes.c_void_p]
            lib.raft_commit_index.restype = ctypes.c_longlong
            lib.raft_commit_index.argtypes = [ctypes.c_void_p]
            lib.raft_term.restype = ctypes.c_longlong
            lib.raft_term.argtypes = [ctypes.c_void_p]
            lib.raft_leader.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
            ]
            lib.raft_get_configuration.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
            ]
            lib.raft_shutdown.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


FOLLOWER, CANDIDATE, LEADER = 0, 1, 2


class RaftNode:
    """One consensus participant.

    ``apply_fn(data: bytes, index: int)`` is invoked for every committed
    log entry, in order — the Python-side FSM (the reference forwards the
    entry to the executor's gRPC endpoint; here the worker handler is
    called directly in-process).
    """

    def __init__(
        self,
        node_id: str,
        bind_addr: str,
        apply_fn: Optional[Callable[[bytes, int], None]] = None,
        restore_fn: Optional[Callable[[bytes, int], None]] = None,
    ):
        self.logger = MarieLogger(f"raft/{node_id}")
        self.node_id = node_id
        self.bind_addr = bind_addr
        self.apply_fn = apply_fn
        self.restore_fn = restore_fn
        self.applied: List[bytes] = []
        self.restored: List[bytes] = []
        lib = _load()

        def _cb(data, length, index, _user):
            payload = ctypes.string_at(data, length)
            self.applied.append(payload)
            if self.apply_fn is not None:
                try:
                    self.apply_fn(payload, int(index))
                except Exception as ex:  # noqa: BLE001
                    self.logger.error(f"apply_fn failed at {index}: {ex!r}")

        def _rcb(data, length, index, _user):
            payload = ctypes.string_at(data, length) if length else b""
            self.restored.append(payload)
            if self.restore_fn is not None:
                try:
                    self.restore_fn(payload, int(index))
                except Exception as ex:  # noqa: BLE001
                    self.logger.error(f"restore_fn failed at {index}: {ex!r}")

        self._cb = _APPLY_CB(_cb)  # keep a reference — ctypes trampoline
        self._rcb = _APPLY_CB(_rcb)
        self._node = lib.raft_create(
            node_id.encode(), bind_addr.encode(), self._cb, None
        )
        lib.raft_set_restore_cb(self._node, self._rcb, None)
        self._lib = lib
        self._started = False

    def start(self) -> "RaftNode":
        rc = self._lib.raft_start(self._node)
        if rc != 0:
            raise OSError(f"raft node failed to bind {self.bind_addr}")
        self._started = True
        return self

    def add_voter(self, node_id: str, addr: str) -> None:
        self._lib.raft_add_voter(self._node, node_id.encode(), addr.encode())

    def submit(self, data: bytes) -> int:
        """Append a log entry (leader only). Returns index, 0 if follower."""
        return int(self._lib.raft_submit(self._node, data, len(data)))

    def snapshot(self, state: bytes) -> int:
        """Record ``state`` (the executor snapshot blob) at last_applied
        and COMPACT the log below it — long-lived deployments stay
        bounded and fresh followers catch up from the blob + tail
        (reference: hashicorp/raft fsm.go:132 + snapshot.go)."""
        return int(self._lib.raft_snapshot(self._node, state, len(state)))

    @property
    def log_length(self) -> int:
        """Entries currently retained (post-compaction suffix)."""
        return int(self._lib.raft_log_length(self._node))

    @property
    def snapshot_index(self) -> int:
        return int(self._lib.raft_snapshot_index(self._node))

    @property
    def state(self) -> int:
        return int(self._lib.raft_state(self._node))

    @property
    def is_leader(self) -> bool:
        return self.state == LEADER

    @property
    def commit_index(self) -> int:
        return int(self._lib.raft_commit_index(self._node))

    @property
    def term(self) -> int:
        return int(self._lib.raft_term(self._node))

    @property
    def leader_id(self) -> str:
        buf = ctypes.create_string_buffer(256)
        self._lib.raft_leader(self._node, buf, 256)
        return buf.value.decode()

    def get_configuration(self) -> dict:
        buf = ctypes.create_string_buffer(16384)
        self._lib.raft_get_configuration(self._node, buf, 16384)
        return json.loads(buf.value.decode())

    def shutdown(self) -> None:
        if self._node is not None:
            self._lib.raft_shutdown(self._node)
            self._node = None

    def __enter__(self) -> "RaftNode":
        return self.start()

    def __exit__(self, *args) -> None:
        self.shutdown()
