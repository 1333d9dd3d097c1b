"""Drive a LIVE repo gateway with the REFERENCE's generated protobuf code.

Runs in its own process (the reference ``jina_pb2`` registers
``jina.DataRequestProto`` et al. in the default descriptor pool, which
conflicts with this repo's ``marie_pb2`` — same symbols, different file).
Invoked by tests/integration/test_reference_client_session.py with the
gateway address as argv[1].

The session mirrors the call sequence of the reference's
``GRPCBaseClient`` (/root/reference/marie/clients/base/grpc.py):

  1. ``JinaGatewayDryRunRPC/dry_run``   — grpc.py:46-57 probes flow
     readiness with an Empty and expects ``StatusProto.SUCCESS``;
  2. ``JinaDiscoverEndpointsRPC/endpoint_discovery`` — the client-side
     schema fetch (helper.py exposes it before posting);
  3. ``JinaRPC/Call`` bidi stream of docs-mode ``DataRequestProto``s —
     the client's default streaming data plane (stream_rpc.py), request
     bytes produced by the REFERENCE message classes;
  4. ``JinaSingleDataRequestRPC/process_single_data`` — the unary path
     (unary_rpc.py retry wrapper's underlying call).

Every response is deserialized by the REFERENCE pb2 classes — proving
the repo gateway's response bytes parse with reference code — and must
answer in the protobuf ``docs`` mode the request arrived in (content
negotiation, round-4 wire parity).
"""

import importlib.util
import sys
import types

REF_PB2 = "/root/reference/marie/proto/docarray_v2/pb2/jina_pb2.py"
REPO = "/root/repo"


def _load_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    address = sys.argv[1]

    # the reference pb2 imports docarray's generated module; shim it with
    # this repo's docarray_pb2 (the wire-layout compatibility claim)
    da_pb2 = _load_module(
        "docarray_pb2", f"{REPO}/marie_tpu/proto/docarray_pb2.py"
    )
    for name in ("docarray", "docarray.proto", "docarray.proto.pb2"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["docarray.proto.pb2.docarray_pb2"] = da_pb2
    sys.modules["docarray.proto.pb2"].docarray_pb2 = da_pb2
    jina_pb2 = _load_module("ref_jina_pb2", REF_PB2)

    import grpc
    from google.protobuf import empty_pb2, json_format

    def make_request(request_id, texts):
        req = jina_pb2.DataRequestProto()
        req.header.request_id = request_id
        req.header.exec_endpoint = "/echo"
        json_format.ParseDict({"traversal": "r"}, req.parameters)
        for i, t in enumerate(texts):
            doc = req.data.docs.docs.add()
            node = doc.data["id"]
            node.text = f"{request_id}-d{i}"
            node.type = "text"
            node = doc.data["text"]
            node.text = t
            node.type = "text"
        return req

    def doc_texts(resp):
        assert resp.data.WhichOneof("documents") == "docs", (
            "gateway must answer in the protobuf docs mode the reference "
            f"client sent, got {resp.data.WhichOneof('documents')!r}"
        )
        out = []
        for doc in resp.data.docs.docs:
            node = doc.data["text"]
            assert node.type == "text"
            out.append(node.text)
        return out

    channel = grpc.insecure_channel(address)
    grpc.channel_ready_future(channel).result(timeout=20)

    # 1. dry run (reference grpc.py:46-57)
    dry_run = channel.unary_unary(
        "/jina.JinaGatewayDryRunRPC/dry_run",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=jina_pb2.StatusProto.FromString,
    )
    status = dry_run(empty_pb2.Empty())
    assert status.code == jina_pb2.StatusProto.SUCCESS, status

    # 2. endpoint discovery
    discover = channel.unary_unary(
        "/jina.JinaDiscoverEndpointsRPC/endpoint_discovery",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=jina_pb2.EndpointsProto.FromString,
    )
    eps = discover(empty_pb2.Empty())
    assert "/echo" in list(eps.endpoints), list(eps.endpoints)

    # 3. bidi stream — the reference client's default data plane
    call = channel.stream_stream(
        "/jina.JinaRPC/Call",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=jina_pb2.DataRequestProto.FromString,
    )
    requests = [
        make_request("ref-sess-0", ["alpha", "beta"]),
        make_request("ref-sess-1", ["gamma"]),
        make_request("ref-sess-2", ["delta", "epsilon", "zeta"]),
    ]
    streamed = {}
    for resp in call(iter(requests)):
        assert resp.header.status.code == jina_pb2.StatusProto.SUCCESS, resp
        streamed[resp.header.request_id] = doc_texts(resp)
    assert streamed == {
        "ref-sess-0": ["echo:alpha", "echo:beta"],
        "ref-sess-1": ["echo:gamma"],
        "ref-sess-2": ["echo:delta", "echo:epsilon", "echo:zeta"],
    }, streamed

    # 4. unary single-data path
    single = channel.unary_unary(
        "/jina.JinaSingleDataRequestRPC/process_single_data",
        request_serializer=lambda m: m.SerializeToString(),
        response_deserializer=jina_pb2.DataRequestProto.FromString,
    )
    resp = single(make_request("ref-sess-unary", ["omega"]))
    assert resp.header.status.code == jina_pb2.StatusProto.SUCCESS
    assert doc_texts(resp) == ["echo:omega"]
    # the gateway's route trace parses with the reference Timestamp types
    assert any(r.executor for r in resp.routes), resp.routes

    channel.close()
    print("REFERENCE-CLIENT-SESSION-OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
