"""Wire-payload interop with the reference's protobuf code (VERDICT r3 #5).

Fixtures under tests/fixtures/ were serialized by the REFERENCE's
generated ``jina_pb2`` (``/root/reference/marie/proto/docarray_v2/pb2``,
see scripts/gen_reference_fixture.py — it shims the docarray dependency
with THIS repo's ``docarray_pb2``, which is itself a compatibility
check).  These tests prove:

1. this repo's pb2 DECODES a reference-encoded DataRequestProto
   (Struct parameters, Timestamp routes, DocListProto docs),
2. the decoded payload surfaces as proper Documents (text/tags/tensor,
   foreign doc fields preserved in ``Document.extra``),
3. re-encoding through the Document layer is BYTE-IDENTICAL to the
   reference bytes (lossless conversion, deterministic serialization),
4. responses answer in the mode the request arrived in (content
   negotiation), while the framework's own fast path stays JSON bytes.
"""

import os

import numpy as np
import pytest

from marie_tpu.proto import marie_pb2
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")
DATAREQ_BIN = os.path.join(FIXTURE_DIR, "reference_datarequest.bin")
SINGLEDOC_BIN = os.path.join(FIXTURE_DIR, "reference_singledoc.bin")


@pytest.fixture
def fixture_bytes():
    with open(DATAREQ_BIN, "rb") as f:
        return f.read()


def test_reference_datarequest_decodes(fixture_bytes):
    req = DataRequest.from_bytes(fixture_bytes)
    assert req.request_id == "fixture-0001"
    assert req.exec_endpoint == "/document/extract"
    assert req.target_executor == "extract_t"
    assert req.wire_mode == "docs"

    params = req.parameters
    assert params["mode"] == "sparse"
    assert params["page"] == 3
    assert params["ratio"] == 0.75
    assert params["flags"] == [True, "a", 2.0]
    assert params["features"]["classifier"]["enabled"] is True

    docs = req.docs
    assert len(docs) == 2
    a, b = docs[0], docs[1]
    assert a.id == "doc-a" and a.text == "invoice total 128.50"
    assert a.tags == {"page": 1, "lang": "en", "clean": True}
    assert a.tensor.dtype == np.float32 and a.tensor.shape == (4, 6)
    assert b.id == "doc-b" and b.uri == "s3://bucket/scan.tiff"
    assert b.blob == b"\x00\x01\x02tiffbytes"
    # foreign (AssetKeyDoc-style) fields survive in .extra
    assert b.extra["asset_key"] == "generators/abc123"
    assert b.extra["pages"] == [1, 2, 3]
    assert b.embedding.shape == (8,)

    # route timestamps decoded as protobuf Timestamps
    assert req.routes[0].executor == "gateway"
    assert req.routes[0].start_time.ToMilliseconds() == 1787133600500


def test_reference_datarequest_reencodes_byte_identical(fixture_bytes):
    req = DataRequest.from_bytes(fixture_bytes)
    # force the full decode -> Document -> re-encode path (not a lazy
    # pass-through): touch docs and parameters so flush() rebuilds both
    req.docs = req.docs
    req.parameters = req.parameters
    assert req.to_bytes() == fixture_bytes


def test_reference_singledoc_decodes():
    with open(SINGLEDOC_BIN, "rb") as f:
        raw = f.read()
    sreq = marie_pb2.SingleDocumentRequestProto()
    sreq.ParseFromString(raw)
    doc = Document.from_docarray_proto(sreq.document)
    assert doc.id == "doc-s" and doc.text == "stream me"
    # byte-identical re-encode of the document payload
    out = marie_pb2.SingleDocumentRequestProto()
    out.header.CopyFrom(sreq.header)
    out.parameters.CopyFrom(sreq.parameters)
    doc.to_docarray_proto(out.document)
    assert out.SerializeToString(deterministic=True) == raw


def test_content_negotiation_modes():
    # JSON fast path is the default for requests born in this framework
    req = DataRequest.from_docs(
        DocumentArray([Document(text="fast")]), endpoint="/x"
    )
    raw = req.to_bytes()
    parsed = marie_pb2.DataRequestProto()
    parsed.ParseFromString(raw)
    assert parsed.data.WhichOneof("documents") == "docs_bytes"

    # a docarray-mode request round-trips in docarray mode (responses
    # answer in kind: handlers mutate and re-serialize the same request)
    ref = marie_pb2.DataRequestProto()
    ref.header.request_id = "nego"
    d = ref.data.docs.docs.add()
    d.data["id"].text = "n1"
    d.data["text"].text = "hello"
    req2 = DataRequest.from_bytes(ref.SerializeToString())
    assert req2.wire_mode == "docs"
    req2.docs[0].text = "mutated"
    req2.docs = req2.docs  # mark dirty
    out = marie_pb2.DataRequestProto()
    out.ParseFromString(req2.to_bytes())
    assert out.data.WhichOneof("documents") == "docs"
    assert out.data.docs.docs[0].data["text"].text == "mutated"


def test_tensor_and_nested_docs_roundtrip():
    rng = np.random.default_rng(7)
    doc = Document(
        text="parent",
        tensor=rng.standard_normal((3, 5)).astype(np.float32),
        tags={"k": 1, "s": "v", "nested": {"a": [1, 2]}},
        chunks=[Document(text="child", tags={"i": 0})],
    )
    dp = doc.to_docarray_proto()
    back = Document.from_docarray_proto(dp)
    assert back.text == "parent"
    assert np.array_equal(back.tensor, doc.tensor)
    assert back.tags == doc.tags
    assert len(back.chunks) == 1 and back.chunks[0].text == "child"
    # and the re-encode is stable
    assert (
        back.to_docarray_proto().SerializeToString(deterministic=True)
        == dp.SerializeToString(deterministic=True)
    )
