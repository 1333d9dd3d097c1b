"""docarray-v2 protobuf payload conversion.

The reference exchanges docs on the wire as ``docarray.DocListProto``
(``/root/reference/marie/proto/docarray_v2/jina.proto:109-125``); each
``DocProto`` is a ``map<string, NodeProto>`` where a ``NodeProto`` is a
tagged union (text / integer / float / boolean / blob / ndarray / doc /
doc_array / list / set / tuple / dict).  This module converts between
those protos and plain python values so :class:`~marie_tpu.types.docs.
Document` can interoperate with reference clients.

Conversion is LOSSLESS for the full node vocabulary: unknown doc fields
survive a decode→encode round trip (they ride in ``Document.extra``),
and re-encoding with ``SerializeToString(deterministic=True)`` is
byte-stable (protobuf maps serialize sorted by key).
"""

from typing import Any, Dict

import numpy as np

from marie_tpu.proto import docarray_pb2


def node_to_py(node) -> Any:
    """NodeProto -> python value."""
    which = node.WhichOneof("content")
    if which is None:
        return None
    if which in ("text", "integer", "float", "boolean", "blob"):
        return getattr(node, which)
    if which == "ndarray":
        dense = node.ndarray.dense
        arr = np.frombuffer(dense.buffer, dtype=np.dtype(dense.dtype))
        return arr.reshape(tuple(dense.shape)) if dense.shape else arr
    if which == "doc":
        return docproto_to_dict(node.doc)
    if which == "doc_array":
        return [docproto_to_dict(d) for d in node.doc_array.docs]
    if which in ("list", "tuple"):
        return [node_to_py(n) for n in getattr(node, which).data]
    if which == "set":
        return [node_to_py(n) for n in node.set.data]
    if which == "dict":
        return {k: node_to_py(v) for k, v in node.dict.data.items()}
    raise ValueError(f"unsupported NodeProto content: {which}")


_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1


def py_to_node(value: Any, node) -> None:
    """Build ``value`` into the given NodeProto (in place)."""
    if value is None:
        return  # empty node
    if isinstance(value, bool):  # before int — bool is an int subclass
        node.boolean = value
        node.type = "boolean"
    elif isinstance(value, str):
        node.text = value
        node.type = "text"
    elif isinstance(value, (bytes, bytearray)):
        node.blob = bytes(value)
        node.type = "bytes"
    elif isinstance(value, (int, np.integer)):
        v = int(value)
        if _INT32_MIN <= v <= _INT32_MAX:
            node.integer = v
            node.type = "integer"
        else:  # NodeProto.integer is int32; wide ints ride as double
            node.float = float(v)
            node.type = "float"
    elif isinstance(value, (float, np.floating)):
        node.float = float(value)
        node.type = "float"
    elif isinstance(value, np.ndarray):
        node.ndarray.dense.buffer = np.ascontiguousarray(value).tobytes()
        node.ndarray.dense.shape.extend(value.shape)
        node.ndarray.dense.dtype = str(value.dtype)
        node.type = "ndarray"
    elif isinstance(value, dict):
        if _looks_like_doc(value):
            dict_to_docproto(value, node.doc)
            node.type = "doc"
        else:
            for k, v in value.items():
                py_to_node(v, node.dict.data[str(k)])
            node.type = "dict"
    elif isinstance(value, (list, tuple, set, frozenset)):
        items = list(value)
        if items and all(isinstance(i, dict) and _looks_like_doc(i) for i in items):
            for i in items:
                dict_to_docproto(i, node.doc_array.docs.add())
            node.type = "docarray"
        else:
            target = (
                node.list if isinstance(value, list)
                else node.tuple if isinstance(value, tuple)
                else node.set
            )
            for i in items:
                py_to_node(i, target.data.add())
            node.type = (
                "list" if isinstance(value, list)
                else "tuple" if isinstance(value, tuple)
                else "set"
            )
    else:
        raise ValueError(f"cannot encode {type(value).__name__} into NodeProto")


def _looks_like_doc(d: Dict[str, Any]) -> bool:
    """Nested docs are dicts with an 'id' key (docarray sub-documents)."""
    return "id" in d


def docproto_to_dict(dp) -> Dict[str, Any]:
    return {k: node_to_py(v) for k, v in dp.data.items()}


def dict_to_docproto(d: Dict[str, Any], dp=None):
    if dp is None:
        dp = docarray_pb2.DocProto()
    for k, v in d.items():
        if v is None:
            continue
        py_to_node(v, dp.data[str(k)])
    return dp
