"""DataRequest / Response — lazy wrappers over the wire proto.

Parity with the reference's request types
(``/root/reference/marie/types_core/request/data.py:17,394``): lazy
deserialisation (docs/parameters only decoded when accessed), status
handling, routes, and ``to_proto``/``from_proto`` round-trip.

Wire layout matches the reference's ``jina.proto`` exactly: parameters
are a ``google.protobuf.Struct``, route times are ``Timestamp``s, and
docs ride in ``data`` as EITHER a ``docarray.DocListProto`` (reference
clients) or JSON bytes in ``docs_bytes`` (this framework's fast path —
the oneof is part of the reference schema,
``/root/reference/marie/proto/docarray_v2/jina.proto:117-122``).
Content negotiation is per-request: responses flush docs back in the
mode the request arrived in.
"""

import json
import uuid
from datetime import datetime
from typing import Any, Dict, Optional

from google.protobuf import json_format

from marie_tpu.proto import marie_pb2
from marie_tpu.types.docs import Document, DocumentArray


def ts_iso(ts) -> str:
    """Timestamp proto -> ISO-8601 string ('' when unset)."""
    if ts.seconds == 0 and ts.nanos == 0:
        return ""
    return ts.ToDatetime().isoformat() + "+00:00"


class DataRequest:
    def __init__(self, proto: Optional[marie_pb2.DataRequestProto] = None):
        self.proto = proto or marie_pb2.DataRequestProto()
        if not self.proto.header.request_id:
            self.proto.header.request_id = uuid.uuid4().hex
        self._docs_cache: Optional[DocumentArray] = None
        self._params_cache: Optional[Dict[str, Any]] = None
        # which data oneof the docs arrived in — responses answer in kind
        # ("docs_bytes" JSON fast path by default; "docs" = DocListProto)
        self.wire_mode = (
            "docs" if self.proto.data.WhichOneof("documents") == "docs"
            else "docs_bytes"
        )

    # --- identity / routing -------------------------------------------
    @property
    def request_id(self) -> str:
        return self.proto.header.request_id

    @request_id.setter
    def request_id(self, value: str) -> None:
        self.proto.header.request_id = value

    @property
    def header(self):
        return self.proto.header

    @property
    def exec_endpoint(self) -> str:
        return self.proto.header.exec_endpoint or "/"

    @exec_endpoint.setter
    def exec_endpoint(self, value: str) -> None:
        self.proto.header.exec_endpoint = value

    @property
    def target_executor(self) -> str:
        return self.proto.header.target_executor or ""

    @target_executor.setter
    def target_executor(self, value: str) -> None:
        self.proto.header.target_executor = value

    # --- payload ------------------------------------------------------
    @property
    def docs(self) -> DocumentArray:
        if self._docs_cache is None:
            which = self.proto.data.WhichOneof("documents")
            if which == "docs_bytes" and self.proto.data.docs_bytes:
                self._docs_cache = DocumentArray.from_json(
                    self.proto.data.docs_bytes.decode()
                )
            elif which == "docs":
                self._docs_cache = DocumentArray.from_docarray_proto(
                    self.proto.data.docs
                )
            else:
                self._docs_cache = DocumentArray()
        return self._docs_cache

    @docs.setter
    def docs(self, docs: DocumentArray) -> None:
        if not isinstance(docs, DocumentArray):
            docs = DocumentArray(docs)
        self._docs_cache = docs

    @property
    def parameters(self) -> Dict[str, Any]:
        if self._params_cache is None:
            if self.proto.parameters.fields:
                self._params_cache = json_format.MessageToDict(
                    self.proto.parameters
                )
            else:
                self._params_cache = {}
        return self._params_cache

    @parameters.setter
    def parameters(self, value: Dict[str, Any]) -> None:
        self._params_cache = dict(value or {})

    # --- status -------------------------------------------------------
    @property
    def status(self):
        return self.proto.header.status

    def is_error(self) -> bool:
        return self.proto.header.status.code == marie_pb2.StatusProto.ERROR

    def add_exception(self, ex: BaseException, executor: str = "") -> None:
        import traceback

        st = self.proto.header.status
        st.code = marie_pb2.StatusProto.ERROR
        st.description = repr(ex)
        st.exception.name = type(ex).__name__
        del st.exception.args[:]
        st.exception.args.extend([str(a) for a in ex.args])
        del st.exception.stacks[:]
        st.exception.stacks.extend(
            traceback.format_exception(type(ex), ex, ex.__traceback__)
        )
        st.exception.executor = executor

    def add_route(self, executor: str, start_time: str = "", end_time: str = "") -> None:
        """Record a hop; times are ISO-8601 strings (wire: Timestamp)."""
        r = self.proto.routes.add()
        r.executor = executor
        if start_time:
            r.start_time.FromDatetime(datetime.fromisoformat(start_time))
        if end_time:
            r.end_time.FromDatetime(datetime.fromisoformat(end_time))

    @property
    def routes(self):
        return self.proto.routes

    # --- serialization ------------------------------------------------
    def flush(self) -> None:
        """Write caches back into the proto (in the negotiated mode)."""
        if self._docs_cache is not None:
            if self.wire_mode == "docs":
                self.proto.data.docs.Clear()
                self._docs_cache.to_docarray_proto(self.proto.data.docs)
            else:
                self.proto.data.docs_bytes = (
                    self._docs_cache.to_json().encode()
                )
        if self._params_cache is not None:
            self.proto.parameters.Clear()
            json_format.ParseDict(
                _jsonable(self._params_cache), self.proto.parameters
            )

    @property
    def doc_count(self) -> int:
        """Number of docs WITHOUT decoding the payload when possible."""
        if self._docs_cache is not None:
            return len(self._docs_cache)
        which = self.proto.data.WhichOneof("documents")
        if which == "docs":
            return len(self.proto.data.docs.docs)
        return len(self.docs)

    def to_bytes(self) -> bytes:
        self.flush()
        return self.proto.SerializeToString(deterministic=True)

    @classmethod
    def from_bytes(cls, data: bytes) -> "DataRequest":
        proto = marie_pb2.DataRequestProto()
        proto.ParseFromString(data)
        return cls(proto)

    @classmethod
    def from_docs(
        cls,
        docs,
        endpoint: str = "/",
        parameters: Optional[Dict[str, Any]] = None,
        target_executor: str = "",
    ) -> "DataRequest":
        req = cls()
        req.docs = docs if isinstance(docs, DocumentArray) else DocumentArray(docs)
        req.exec_endpoint = endpoint
        if parameters:
            req.parameters = parameters
        if target_executor:
            req.target_executor = target_executor
        return req

    def __repr__(self) -> str:
        return (
            f"<DataRequest {self.request_id[:8]} endpoint={self.exec_endpoint} "
            f"docs={len(self.docs)}>"
        )


def _jsonable(obj: Any) -> Any:
    """Parameters may carry non-JSON scalars (numpy) — normalise for
    Struct encoding the same way json.dumps(default=...) used to."""
    return json.loads(json.dumps(obj, default=_json_default))


def _json_default(o: Any):
    import numpy as np

    if isinstance(o, (np.integer, np.floating)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, bytes):
        import base64

        return base64.b64encode(o).decode()
    raise TypeError(f"not JSON serializable: {type(o).__name__}")


def to_request_list_bytes(requests) -> bytes:
    """Serialize requests as ``jina.DataRequestListProto`` — the wire
    type of ``JinaDataRequestRPC/process_data`` (reference jina.proto:169)."""
    lst = marie_pb2.DataRequestListProto()
    for r in requests:
        r.flush()
        lst.requests.append(r.proto)
    return lst.SerializeToString(deterministic=True)


def from_request_list_bytes(data: bytes):
    """Parse ``DataRequestListProto`` bytes -> list of :class:`DataRequest`."""
    lst = marie_pb2.DataRequestListProto()
    lst.ParseFromString(data)
    return [DataRequest(p) for p in lst.requests]


Response = DataRequest  # responses reuse the same envelope (reference :394)
