"""Generate wire-interop fixtures with the REFERENCE's generated protobuf
code (``/root/reference/marie/proto/docarray_v2/pb2/jina_pb2.py``).

The reference pb2 imports ``docarray.proto.pb2.docarray_pb2`` from the
docarray package (absent in this environment), so this script shims that
module chain with this repo's generated ``docarray_pb2`` — which is
exactly the compatibility claim under test: the two codebases must agree
on ``docarray.proto``'s wire layout for the shim (and the fixture) to
work at all.

MUST run in its own process: the reference ``jina_pb2`` registers
``jina.DataRequestProto`` et al. in the default descriptor pool, which
conflicts with this repo's ``marie_pb2`` (same symbols, different file).
Do NOT import marie_tpu here.

    python scripts/gen_reference_fixture.py

Writes tests/fixtures/reference_datarequest.bin and
tests/fixtures/reference_singledoc.bin (deterministic serialization).
"""

import importlib.util
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_PB2 = "/root/reference/marie/proto/docarray_v2/pb2/jina_pb2.py"
OUT_DIR = os.path.join(REPO, "tests", "fixtures")


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    # our generated docarray_pb2, loaded standalone (no marie_tpu import)
    da_pb2 = _load_module(
        "docarray_pb2", os.path.join(REPO, "marie_tpu", "proto", "docarray_pb2.py")
    )
    # shim the docarray package chain the reference pb2 imports
    for name in ("docarray", "docarray.proto", "docarray.proto.pb2"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["docarray.proto.pb2.docarray_pb2"] = da_pb2
    sys.modules["docarray.proto.pb2"].docarray_pb2 = da_pb2

    jina_pb2 = _load_module("ref_jina_pb2", REF_PB2)

    from google.protobuf import json_format

    req = jina_pb2.DataRequestProto()
    req.header.request_id = "fixture-0001"
    req.header.exec_endpoint = "/document/extract"
    req.header.target_executor = "extract_t"
    json_format.ParseDict(
        {"mode": "sparse", "page": 3, "ratio": 0.75, "flags": [True, "a", 2.0],
         "features": {"classifier": {"enabled": True}}},
        req.parameters,
    )
    r = req.routes.add()
    r.executor = "gateway"
    r.start_time.FromJsonString("2026-08-19T10:00:00.500Z")
    r.end_time.FromJsonString("2026-08-19T10:00:01.250Z")

    def add_doc(dl, **fields):
        doc = dl.docs.add()
        for k, v in fields.items():
            node = doc.data[k]
            if isinstance(v, bool):
                node.boolean = v
                node.type = "boolean"
            elif isinstance(v, str):
                node.text = v
                node.type = "text"
            elif isinstance(v, int):
                node.integer = v
                node.type = "integer"
            elif isinstance(v, float):
                node.float = v
                node.type = "float"
            elif isinstance(v, bytes):
                node.blob = v
                node.type = "bytes"
            elif isinstance(v, np.ndarray):
                node.ndarray.dense.buffer = v.tobytes()
                node.ndarray.dense.shape.extend(v.shape)
                node.ndarray.dense.dtype = str(v.dtype)
                node.type = "ndarray"
            elif isinstance(v, dict):
                for dk, dv in v.items():
                    sub = node.dict.data[dk]
                    if isinstance(dv, bool):
                        sub.boolean = dv
                        sub.type = "boolean"
                    elif isinstance(dv, str):
                        sub.text = dv
                        sub.type = "text"
                    elif isinstance(dv, int):
                        sub.integer = dv
                        sub.type = "integer"
                    else:
                        sub.float = float(dv)
                        sub.type = "float"
                node.type = "dict"
            elif isinstance(v, list):
                for item in v:
                    sub = node.list.data.add()
                    if isinstance(item, str):
                        sub.text = item
                        sub.type = "text"
                    elif isinstance(item, bool):
                        sub.boolean = item
                        sub.type = "boolean"
                    elif isinstance(item, int):
                        sub.integer = item
                        sub.type = "integer"
                    else:
                        sub.float = float(item)
                        sub.type = "float"
                node.type = "list"
        return doc

    rng = np.random.default_rng(42)
    tensor = rng.integers(0, 255, (4, 6), dtype=np.uint8).astype(np.float32)
    add_doc(
        req.data.docs,
        id="doc-a",
        text="invoice total 128.50",
        tags={"page": 1, "lang": "en", "clean": True},
        tensor=tensor,
    )
    add_doc(
        req.data.docs,
        id="doc-b",
        uri="s3://bucket/scan.tiff",
        blob=b"\x00\x01\x02tiffbytes",
        asset_key="generators/abc123",  # foreign (AssetKeyDoc) field
        pages=[1, 2, 3],
        embedding=np.linspace(0, 1, 8, dtype=np.float32),
    )

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "reference_datarequest.bin")
    with open(path, "wb") as f:
        f.write(req.SerializeToString(deterministic=True))
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")

    sreq = jina_pb2.SingleDocumentRequestProto()
    sreq.header.request_id = "fixture-0002"
    sreq.header.exec_endpoint = "/stream"
    json_format.ParseDict({"k": "v"}, sreq.parameters)
    node = sreq.document.data["id"]
    node.text = "doc-s"
    node.type = "text"
    node = sreq.document.data["text"]
    node.text = "stream me"
    node.type = "text"
    path = os.path.join(OUT_DIR, "reference_singledoc.bin")
    with open(path, "wb") as f:
        f.write(sreq.SerializeToString(deterministic=True))
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
