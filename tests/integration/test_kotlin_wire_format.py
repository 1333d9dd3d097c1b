"""Pins the JVM clients' wire format against the live server types.

bindings/kotlin TemplateMatcherClient hand-assembles docs JSON with the
ndarray envelope ({"__ndarray__": b64, "dtype", "shape"}) and reads dict
results from parameters.__results__ — these tests post byte-identical
payloads through the Python request/executor stack so a format drift on
either side fails here (no JVM in this environment; the proto round-trip
is covered by tests/integration/test_proto_services.py).
"""

import base64
import json

import numpy as np

from marie_tpu.executor.template_matching_executor import TemplateMatchingExecutor
from marie_tpu.types.request import DataRequest


def _kotlin_ndarray_json(img: np.ndarray) -> str:
    b64 = base64.b64encode(img.tobytes()).decode()
    h, w = img.shape
    return (
        '{"__ndarray__":"%s","dtype":"uint8","shape":[%d,%d]}' % (b64, h, w)
    )


def _raw_request(docs_json: str, endpoint: str, params=None) -> DataRequest:
    req = DataRequest()
    req.proto.data.docs_bytes = docs_json.encode()
    req.exec_endpoint = endpoint
    if params:
        from google.protobuf import json_format

        json_format.ParseDict(params, req.proto.parameters)
    return req


def test_ndarray_envelope_round_trip():
    img = (np.arange(64 * 48) % 251).astype(np.uint8).reshape(64, 48)
    docs_json = (
        '[{"tensor":%s,"tags":{"label":"stamp","bbox":[4,4,32,32]}}]'
        % _kotlin_ndarray_json(img)
    )
    req = _raw_request(docs_json, "/template_matching/register")
    doc = req.docs[0]
    assert doc.tensor is not None
    assert doc.tensor.dtype == np.uint8 and doc.tensor.shape == (64, 48)
    assert (doc.tensor == img).all()
    assert doc.tags["label"] == "stamp" and doc.tags["bbox"] == [4, 4, 32, 32]


def test_register_and_match_through_kotlin_payloads():
    img = (np.arange(64 * 48) % 251).astype(np.uint8).reshape(64, 48)
    ex = TemplateMatchingExecutor(matcher_name="ncc")

    reg_req = _raw_request(
        '[{"tensor":%s,"tags":{"label":"stamp"}}]' % _kotlin_ndarray_json(img),
        "/template_matching/register",
    )
    out = ex.register(reg_req.docs, {})
    assert out["registered"] == ["stamp"]

    frame = np.full((128, 128), 255, np.uint8)
    frame[10:74, 20:68] = img
    match_req = _raw_request(
        '[{"tensor":%s}]' % _kotlin_ndarray_json(frame),
        "/document/matcher",
    )
    res = ex.match(
        match_req.docs,
        {"score_threshold": 0.5, "max_matches_per_template": 3},
    )
    assert res["status"] == "succeeded"
    (m,) = res["matches"]
    assert m["label"] == "stamp"
    assert m["bbox"] == [20, 10, 48, 64]
    assert m["score"] >= 0.99
    # the result rows carry exactly the keys the Kotlin client reads
    assert set(m) >= {"frame_index", "label", "bbox", "score", "similarity"}
