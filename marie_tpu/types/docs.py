"""Document / DocumentArray — the framework's data currency.

The reference re-exports docarray's ``Document``/``DocumentArray``
(``/root/reference/marie/__init__.py:163``); docarray is not available
here, so this module provides a self-contained pydantic-v2 equivalent
with the subset of the surface the framework and its users rely on:
typed fields (``text``, ``tensor``, ``blob``, ``tags``, ``embedding``),
nested ``chunks``/``matches``, dict/JSON round-trip, and a list-like
``DocumentArray`` with attribute-batch access.

Tensors are numpy arrays end-to-end; JAX arrays are accepted on set and
materialised to numpy (device arrays must not leak into the wire layer).
"""

import base64
import uuid
from typing import Any, Dict, Iterable, Iterator, List, Optional, Sequence, Union

import numpy as np
from pydantic import BaseModel, ConfigDict, Field, field_serializer, field_validator


def _to_numpy(v: Any) -> Optional[np.ndarray]:
    if v is None:
        return None
    if isinstance(v, np.ndarray):
        return v
    if hasattr(v, "__array__"):  # jax.Array, torch.Tensor(cpu), lists
        return np.asarray(v)
    return np.asarray(v)


class BaseDoc(BaseModel):
    """Base pydantic doc with an auto-generated id."""

    model_config = ConfigDict(arbitrary_types_allowed=True, validate_assignment=False)

    id: str = Field(default_factory=lambda: uuid.uuid4().hex)

    def to_dict(self) -> Dict[str, Any]:
        d = self.model_dump()
        return _encode_ndarrays(d)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "BaseDoc":
        return cls.model_validate(_decode_ndarrays(d))

    def to_json(self) -> str:
        import json

        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "BaseDoc":
        import json

        return cls.from_dict(json.loads(s))


_NDARRAY_KEY = "__ndarray__"


def _encode_ndarrays(obj: Any) -> Any:
    if isinstance(obj, np.ndarray):
        return {
            _NDARRAY_KEY: base64.b64encode(np.ascontiguousarray(obj).tobytes()).decode(),
            "dtype": str(obj.dtype),
            "shape": list(obj.shape),
        }
    if isinstance(obj, bytes):
        return {"__bytes__": base64.b64encode(obj).decode()}
    if isinstance(obj, dict):
        return {k: _encode_ndarrays(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_encode_ndarrays(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    return obj


def _decode_ndarrays(obj: Any) -> Any:
    if isinstance(obj, dict):
        if _NDARRAY_KEY in obj:
            buf = base64.b64decode(obj[_NDARRAY_KEY])
            return np.frombuffer(buf, dtype=np.dtype(obj["dtype"])).reshape(
                obj["shape"]
            ).copy()
        if "__bytes__" in obj:
            return base64.b64decode(obj["__bytes__"])
        return {k: _decode_ndarrays(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode_ndarrays(v) for v in obj]
    return obj


class Document(BaseDoc):
    """General-purpose document (docarray ``Document`` equivalent)."""

    text: Optional[str] = None
    uri: Optional[str] = None
    tensor: Optional[np.ndarray] = None
    blob: Optional[bytes] = None
    embedding: Optional[np.ndarray] = None
    tags: Dict[str, Any] = Field(default_factory=dict)
    mime_type: Optional[str] = None
    modality: Optional[str] = None
    chunks: List["Document"] = Field(default_factory=list)
    matches: List["Document"] = Field(default_factory=list)
    scores: Dict[str, float] = Field(default_factory=dict)
    parent_id: Optional[str] = None
    # fields of foreign (reference docarray) doc schemas that are not
    # part of this Document — preserved so a DocProto decode→encode
    # round trip is lossless (types/docarray_compat.py)
    extra: Dict[str, Any] = Field(default_factory=dict)

    @field_validator("tensor", "embedding", mode="before")
    @classmethod
    def _coerce_tensor(cls, v):
        return _to_numpy(v)

    @field_serializer("tensor", "embedding", when_used="json")
    def _ser_tensor(self, v):
        return _encode_ndarrays(v)

    def __eq__(self, other) -> bool:
        if not isinstance(other, Document):
            return NotImplemented
        return self.id == other.id

    def __hash__(self) -> int:
        return hash(self.id)

    def __repr__(self) -> str:
        bits = [f"id={self.id[:8]}"]
        if self.text is not None:
            bits.append(f"text={self.text[:24]!r}")
        if self.tensor is not None:
            bits.append(f"tensor{self.tensor.shape}")
        if self.tags:
            bits.append(f"tags[{len(self.tags)}]")
        return f"<Document {' '.join(bits)}>"

    # --- docarray-v2 protobuf interop (reference wire payloads) -------
    def to_docarray_proto(self, dp=None):
        """-> ``docarray.DocProto`` (reference DocListProto element)."""
        from marie_tpu.types.docarray_compat import dict_to_docproto

        d: Dict[str, Any] = {"id": self.id}
        for name in ("text", "uri", "mime_type", "modality", "parent_id",
                     "blob"):
            v = getattr(self, name)
            if v is not None:
                d[name] = v
        for name in ("tensor", "embedding"):
            v = getattr(self, name)
            if v is not None:
                d[name] = v
        if self.tags:
            d["tags"] = self.tags
        if self.scores:
            d["scores"] = self.scores
        if self.chunks:
            d["chunks"] = [c.to_docarray_proto_dict() for c in self.chunks]
        if self.matches:
            d["matches"] = [m.to_docarray_proto_dict() for m in self.matches]
        d.update(self.extra)
        return dict_to_docproto(d, dp)

    def to_docarray_proto_dict(self) -> Dict[str, Any]:
        """Nested-doc form: the plain dict an enclosing DocProto embeds."""
        from marie_tpu.types.docarray_compat import docproto_to_dict

        return docproto_to_dict(self.to_docarray_proto())

    @classmethod
    def from_docarray_proto(cls, dp) -> "Document":
        from marie_tpu.types.docarray_compat import docproto_to_dict

        return cls.from_docarray_dict(docproto_to_dict(dp))

    @classmethod
    def from_docarray_dict(cls, d: Dict[str, Any]) -> "Document":
        known, extra = {}, {}
        for k, v in d.items():
            if k in ("chunks", "matches") and isinstance(v, list):
                known[k] = [cls.from_docarray_dict(i) for i in v]
            elif k in cls.model_fields and k != "extra":
                known[k] = v
            else:
                extra[k] = v
        doc = cls(**known)
        doc.extra = extra
        return doc


class DocumentArray:
    """List-like container of :class:`Document` with batch attribute access.

    Supports the access patterns the reference code uses on docarray:
    iteration, indexing (int / slice / id), ``append``/``extend``,
    ``texts`` / ``tensors`` batch views, and dict/JSON round-trip.
    """

    def __init__(self, docs: Optional[Iterable[Document]] = None):
        self._docs: List[Document] = list(docs) if docs is not None else []

    # --- list protocol -------------------------------------------------
    def __len__(self) -> int:
        return len(self._docs)

    def __iter__(self) -> Iterator[Document]:
        return iter(self._docs)

    def __getitem__(self, key: Union[int, slice, str]) -> Any:
        if isinstance(key, str):
            for d in self._docs:
                if d.id == key:
                    return d
            raise KeyError(key)
        if isinstance(key, slice):
            return DocumentArray(self._docs[key])
        return self._docs[key]

    def __setitem__(self, key: int, value: Document) -> None:
        self._docs[key] = value

    def __bool__(self) -> bool:
        return bool(self._docs)

    def __eq__(self, other) -> bool:
        if isinstance(other, DocumentArray):
            return self._docs == other._docs
        if isinstance(other, list):
            return self._docs == other
        return NotImplemented

    def append(self, doc: Document) -> None:
        self._docs.append(doc)

    def extend(self, docs: Iterable[Document]) -> None:
        self._docs.extend(docs)

    def clear(self) -> None:
        self._docs.clear()

    # --- batch views ---------------------------------------------------
    @property
    def texts(self) -> List[Optional[str]]:
        return [d.text for d in self._docs]

    @texts.setter
    def texts(self, values: Sequence[Optional[str]]) -> None:
        for d, v in zip(self._docs, values):
            d.text = v

    @property
    def tensors(self) -> List[Optional[np.ndarray]]:
        return [d.tensor for d in self._docs]

    @property
    def tags(self) -> List[Dict[str, Any]]:
        return [d.tags for d in self._docs]

    # --- serialization -------------------------------------------------
    def to_dict(self) -> List[Dict[str, Any]]:
        return [d.to_dict() for d in self._docs]

    @classmethod
    def from_dict(cls, items: List[Dict[str, Any]], doc_cls=Document) -> "DocumentArray":
        return cls([doc_cls.from_dict(i) for i in items])

    def to_json(self) -> str:
        import json

        return json.dumps(self.to_dict())

    @classmethod
    def from_json(cls, s: str) -> "DocumentArray":
        import json

        return cls.from_dict(json.loads(s))

    def __repr__(self) -> str:
        return f"<DocumentArray ({len(self)} docs)>"

    # --- docarray-v2 protobuf interop ---------------------------------
    def to_docarray_proto(self, dlp=None):
        """-> ``docarray.DocListProto`` (reference wire payload)."""
        from marie_tpu.proto import docarray_pb2

        if dlp is None:
            dlp = docarray_pb2.DocListProto()
        for doc in self._docs:
            doc.to_docarray_proto(dlp.docs.add())
        return dlp

    @classmethod
    def from_docarray_proto(cls, dlp, doc_cls=Document) -> "DocumentArray":
        return cls([doc_cls.from_docarray_proto(d) for d in dlp.docs])

    @staticmethod
    def empty(n: int) -> "DocumentArray":
        return DocumentArray([Document() for _ in range(n)])
