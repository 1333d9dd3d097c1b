"""DataRequest / Response — lazy wrappers over the wire proto.

Parity with the reference's request types
(``/root/reference/marie/types_core/request/data.py:17,394``): lazy
deserialisation (docs/parameters only decoded when accessed), status
handling, routes, and ``to_proto``/``from_proto`` round-trip.
"""

import json
import uuid
from typing import Any, Dict, List, Optional

from marie_tpu.proto import marie_pb2
from marie_tpu.types.docs import Document, DocumentArray


class DataRequest:
    def __init__(self, proto: Optional[marie_pb2.DataRequestProto] = None):
        self.proto = proto or marie_pb2.DataRequestProto()
        if not self.proto.header.request_id:
            self.proto.header.request_id = uuid.uuid4().hex
        self._docs_cache: Optional[DocumentArray] = None
        self._params_cache: Optional[Dict[str, Any]] = None

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
            if self.proto.docs:
                self._docs_cache = DocumentArray.from_json(
                    self.proto.docs.decode()
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
            if self.proto.parameters:
                self._params_cache = json.loads(self.proto.parameters.decode())
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
        r = self.proto.routes.add()
        r.executor = executor
        r.start_time = start_time
        r.end_time = end_time

    @property
    def routes(self):
        return self.proto.routes

    # --- serialization ------------------------------------------------
    def flush(self) -> None:
        """Write caches back into the proto."""
        if self._docs_cache is not None:
            self.proto.docs = self._docs_cache.to_json().encode()
            self.proto.doc_count = len(self._docs_cache)
        if self._params_cache is not None:
            self.proto.parameters = json.dumps(self._params_cache).encode()

    def to_bytes(self) -> bytes:
        self.flush()
        return self.proto.SerializeToString()

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


Response = DataRequest  # responses reuse the same envelope (reference :394)
