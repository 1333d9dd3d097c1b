"""Round-trip the live gRPC server using stubs derived ONLY from
marie.proto's service definitions (VERDICT r1 #5: wire-compat decision,
executed as declared divergence + real service blocks).

This is the grpcurl-style check standing in for the Kotlin client build
(no JVM in this environment): if these dynamically-derived stubs work,
any protoc-generated stub (including bindings/kotlin) talks to the same
surface, because both are driven by the same .proto."""

import asyncio
import json
import re

import grpc
import pytest

from marie_tpu.orchestrate.deployments import Deployment
from google.protobuf import empty_pb2

from marie_tpu.proto import marie_pb2

_EMPTY = empty_pb2.Empty()
from tests.integration.executors import EchoExecutor, SnapshotExecutor

PROTO_PATH = "/root/repo/marie_tpu/proto/marie.proto"


def parse_services(path=PROTO_PATH):
    """Extract {(/pkg.Service/method): (streaming, req_type, resp_type)}."""
    src = open(path).read()
    package = re.search(r"^package\s+(\w+)", src, re.M).group(1)
    out = {}
    for svc_m in re.finditer(r"service\s+(\w+)\s*\{([^}]*)\}", src):
        svc, body = svc_m.groups()
        for rpc in re.finditer(
            r"rpc\s+(\w+)\s*\((stream\s+)?([\w.]+)\)\s*returns\s*\((stream\s+)?([\w.]+)\)",
            body,
        ):
            method, req_stream, req_t, resp_stream, resp_t = rpc.groups()
            out[f"/{package}.{svc}/{method}"] = (
                bool(req_stream or resp_stream), req_t, resp_t,
            )
    return out


def test_proto_declares_the_full_service_surface():
    services = parse_services()
    assert "/jina.JinaDataRequestRPC/process_data" in services
    assert "/jina.JinaSingleDataRequestRPC/process_single_data" in services
    assert services["/jina.JinaRPC/Call"][0] is True  # bidi stream
    assert "/jina.JinaDiscoverEndpointsRPC/endpoint_discovery" in services
    assert "/jina.JinaGatewayDryRunRPC/dry_run" in services
    assert "/jina.JinaInfoRPC/_status" in services
    assert "/jina.JinaExecutorSnapshot/snapshot" in services
    assert "/jina.JinaExecutorRestore/restore" in services
    # full 10-service reference surface (jina.proto:166-330)
    assert services["/jina.JinaSingleDocumentRequestRPC/stream_doc"][0] is True
    assert "/jina.JinaExecutorSnapshotProgress/snapshot_status" in services
    assert "/jina.JinaExecutorRestoreProgress/restore_status" in services
    # request/response types all resolve to generated message classes
    for _, req_t, resp_t in services.values():
        for t in (req_t, resp_t):
            if t.startswith("google.protobuf."):
                continue  # well-known types (Empty)
            assert hasattr(marie_pb2, t.split(".")[-1]), t


def _make_request(endpoint, texts):
    req = marie_pb2.DataRequestProto()
    req.header.request_id = "proto-roundtrip"
    req.header.exec_endpoint = endpoint
    req.data.docs_bytes = json.dumps(
        [{"id": f"d{i}", "text": t} for i, t in enumerate(texts)]
    ).encode()
    return req


def test_proto_derived_stubs_roundtrip_live_server():
    services = parse_services()

    with Deployment(uses=EchoExecutor, name="proto-rt") as dep:
        address = f"127.0.0.1:{dep.first_port}"

        async def drive():
            async with grpc.aio.insecure_channel(address) as ch:
                def stub(path):
                    streaming, req_t, resp_t = services[path]
                    resp_cls = getattr(marie_pb2, resp_t)
                    if streaming:
                        return ch.stream_stream(
                            path,
                            request_serializer=lambda m: m.SerializeToString(),
                            response_deserializer=resp_cls.FromString,
                        )
                    return ch.unary_unary(
                        path,
                        request_serializer=lambda m: m.SerializeToString(),
                        response_deserializer=resp_cls.FromString,
                    )

                # unary data plane
                lst = marie_pb2.DataRequestListProto()
                lst.requests.append(_make_request("/echo", ["hello", "proto"]))
                resp = await stub("/jina.JinaDataRequestRPC/process_data")(lst)
                docs = json.loads(resp.data.docs_bytes)
                assert [d["text"] for d in docs] == ["echo:hello", "echo:proto"]
                assert resp.header.status.code == marie_pb2.StatusProto.SUCCESS

                resp = await stub(
                    "/jina.JinaSingleDataRequestRPC/process_single_data"
                )(_make_request("/echo", ["single"]))
                assert json.loads(resp.data.docs_bytes)[0]["text"] == "echo:single"

                # bidi stream
                call = stub("/jina.JinaRPC/Call")(
                    iter([_make_request("/echo", [f"s{i}"]) for i in range(3)])
                )
                texts = []
                async for r in call:
                    texts.extend(
                        d["text"] for d in json.loads(r.data.docs_bytes)
                    )
                assert texts == ["echo:s0", "echo:s1", "echo:s2"]

                # discovery / dry run / info
                eps = await stub(
                    "/jina.JinaDiscoverEndpointsRPC/endpoint_discovery"
                )(_EMPTY)
                assert "/echo" in list(eps.endpoints)

                st = await stub("/jina.JinaGatewayDryRunRPC/dry_run")(
                    _EMPTY
                )
                assert st.code == marie_pb2.StatusProto.SUCCESS

                info = await stub("/jina.JinaInfoRPC/_status")(_EMPTY)
                assert dict(info.jina)  # version table parses

                # single-document server stream
                sreq = marie_pb2.SingleDocumentRequestProto()
                sreq.header.exec_endpoint = "/echo"
                sreq.document.data["id"].text = "d0"
                sreq.document.data["text"].text = "one"
                sd = ch.unary_stream(
                    "/jina.JinaSingleDocumentRequestRPC/stream_doc",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=(
                        marie_pb2.SingleDocumentRequestProto.FromString
                    ),
                )
                stream_docs = [r async for r in sd(sreq)]
                assert len(stream_docs) == 1
                assert stream_docs[0].document.data["text"].text == "echo:one"

        asyncio.run(drive())

    # snapshot/restore against an executor that implements the hooks
    with Deployment(uses=SnapshotExecutor, name="proto-snap") as dep:
        address = f"127.0.0.1:{dep.first_port}"

        async def drive_snapshot():
            async with grpc.aio.insecure_channel(address) as ch:
                snap_stub = ch.unary_unary(
                    "/jina.JinaExecutorSnapshot/snapshot",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=(
                        marie_pb2.SnapshotStatusProto.FromString
                    ),
                )
                snap = await snap_stub(_EMPTY)
                assert snap.status == marie_pb2.SnapshotStatusProto.SUCCEEDED
                cmd = marie_pb2.RestoreSnapshotCommand()
                cmd.snapshot_file = snap.snapshot_file
                rst_stub = ch.unary_unary(
                    "/jina.JinaExecutorRestore/restore",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=(
                        marie_pb2.RestoreSnapshotStatusProto.FromString
                    ),
                )
                rst = await rst_stub(cmd)
                assert (
                    rst.status == marie_pb2.RestoreSnapshotStatusProto.SUCCEEDED
                )

                # progress services report the recorded status by id,
                # NOT_FOUND for unknown ids
                snap_prog = ch.unary_unary(
                    "/jina.JinaExecutorSnapshotProgress/snapshot_status",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=(
                        marie_pb2.SnapshotStatusProto.FromString
                    ),
                )
                sid = marie_pb2.SnapshotId()
                sid.value = snap.id.value
                got = await snap_prog(sid)
                assert got.status == marie_pb2.SnapshotStatusProto.SUCCEEDED
                assert got.snapshot_file == snap.snapshot_file
                sid.value = "no-such-snapshot"
                assert (
                    await snap_prog(sid)
                ).status == marie_pb2.SnapshotStatusProto.NOT_FOUND

                rst_prog = ch.unary_unary(
                    "/jina.JinaExecutorRestoreProgress/restore_status",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=(
                        marie_pb2.RestoreSnapshotStatusProto.FromString
                    ),
                )
                rid = marie_pb2.RestoreId()
                rid.value = rst.id.value
                assert (
                    await rst_prog(rid)
                ).status == marie_pb2.RestoreSnapshotStatusProto.SUCCEEDED
                rid.value = "no-such-restore"
                assert (
                    await rst_prog(rid)
                ).status == marie_pb2.RestoreSnapshotStatusProto.NOT_FOUND

        asyncio.run(drive_snapshot())


def test_kotlin_client_paths_match_proto():
    """The Kotlin client's hand-built MethodDescriptors stay in lockstep
    with marie.proto's service blocks."""
    kt = open(
        "/root/repo/bindings/kotlin/src/main/kotlin/ai/marietpu/client/MarieClient.kt"
    ).read()
    services = parse_services()
    kt_paths = set(re.findall(r'"(jina\.\w+/\w+)"', kt))
    proto_paths = {p.lstrip("/") for p in services}
    assert proto_paths == kt_paths, proto_paths.symmetric_difference(kt_paths)
    # the binding ships the same proto the server serves
    assert (
        open("/root/repo/bindings/kotlin/src/main/proto/marie.proto").read()
        == open(PROTO_PATH).read()
    )
