"""gRPC server — the framework's primary data plane.

Service-surface parity with the reference
(``/root/reference/marie/proto/docarray_v2/jina.proto:166-330`` — the
service/method names are kept so tooling carries over):
``jina.JinaDataRequestRPC/process_data``,
``jina.JinaSingleDataRequestRPC/process_single_data``, ``jina.JinaRPC/Call``
(bidi stream), ``jina.JinaDiscoverEndpointsRPC/endpoint_discovery``,
``jina.JinaInfoRPC/_status``, ``jina.JinaGatewayDryRunRPC/dry_run``,
snapshot/restore.  Handlers are registered with
``grpc.method_handlers_generic_handler`` (no codegen plugin needed) and a
standard health service responds to ``grpc.health.v1.Health/Check``.
"""

import asyncio
import json
from typing import Optional, Sequence

import grpc

from marie_tpu.logging_core import MarieLogger
from marie_tpu.proto import marie_pb2
from marie_tpu.types.request import DataRequest

_MAX_MSG = 64 * 1024 * 1024

_GRPC_OPTIONS = [
    ("grpc.max_send_message_length", _MAX_MSG),
    ("grpc.max_receive_message_length", _MAX_MSG),
    ("grpc.so_reuseport", 0),
]


def _req_deserializer(data: bytes) -> DataRequest:
    return DataRequest.from_bytes(data)


def _req_list_deserializer(data: bytes):
    # process_data takes DataRequestListProto on the wire (reference
    # jina.proto:169) — multiple requests reduce into one response
    from marie_tpu.types.request import from_request_list_bytes

    return from_request_list_bytes(data)


def _req_serializer(req: DataRequest) -> bytes:
    return req.to_bytes()


class _HealthServicer:
    """grpc.health.v1.Health implementation (serving by default)."""

    def __init__(self):
        self.status = 1  # SERVING

    async def check(self, request: bytes, context) -> bytes:
        # HealthCheckResponse { ServingStatus status = 1; } — hand-encoded
        # varint proto: field 1, varint value
        return bytes([0x08, self.status])


def _guard_stream(fn, check_auth):
    async def wrapped(request_iterator, context):
        await check_auth(context)
        async for item in fn(request_iterator, context):
            yield item

    return wrapped


def _guard_unary_stream(fn, check_auth):
    async def wrapped(request, context):
        await check_auth(context)
        async for item in fn(request, context):
            yield item

    return wrapped


class GRPCServer:
    """Serves a request handler (worker / gateway / head) over gRPC."""

    def __init__(
        self,
        req_handler,
        port: Optional[int] = None,
        host: Optional[str] = None,
        name: str = "grpc",
        compression: Optional[str] = None,
        **kwargs,
    ):
        from marie_tpu.helper import default_bind_host, random_port

        self.req_handler = req_handler
        self.port = port or random_port()
        self.host = host or default_bind_host()
        # server-default response compression ("Gzip"/"Deflate" —
        # reference grpc server compression arg)
        self.compression = (
            getattr(grpc.Compression, compression) if compression else None
        )
        self.logger = MarieLogger(f"GRPCServer/{name}")
        self.server: Optional[grpc.aio.Server] = None
        self.health = _HealthServicer()
        # id -> serialized status proto, for the *Progress services.
        # OrderedDicts with LRU eviction (_STATUS_CAP) — a long-lived
        # server would otherwise retain one proto per snapshot forever
        from collections import OrderedDict

        self._snapshot_status: "OrderedDict[str, bytes]" = OrderedDict()
        self._restore_status: "OrderedDict[str, bytes]" = OrderedDict()

    _STATUS_CAP = 256

    @classmethod
    def _record_status(cls, store, key: str, value: bytes) -> None:
        store[key] = value
        store.move_to_end(key)
        while len(store) > cls._STATUS_CAP:
            store.popitem(last=False)

    # ------------------------------------------------------------------
    async def setup_server(self) -> None:
        self.server = grpc.aio.server(
            options=_GRPC_OPTIONS, compression=self.compression
        )

        from marie_tpu.serve.instrumentation import tracing

        async def _traced_process(requests, context) -> DataRequest:
            # adopt the caller's W3C traceparent (reference
            # _extract_tracing_context, worker request_handling.py:1158)
            if isinstance(requests, DataRequest):
                requests = [requests]
            parent = tracing.extract_metadata(context.invocation_metadata())
            with tracing.activate(parent):
                with tracing.start_span(
                    f"rpc/{getattr(self.req_handler, 'name', 'handler')}",
                    {"request_id": requests[0].request_id,
                     "endpoint": requests[0].exec_endpoint},
                ):
                    return await self.req_handler.process_data(requests)

        async def process_data(requests, context) -> DataRequest:
            return await _traced_process(requests, context)

        async def process_single_data(request: DataRequest, context) -> DataRequest:
            return await _traced_process(request, context)

        async def call_stream(request_iterator, context):
            handler_stream = getattr(self.req_handler, "stream", None)
            if handler_stream is not None:
                # gateway: prefetch-limited CONCURRENT processing with
                # completion-order (or opt-in submission-order) results —
                # the reference RequestStreamer wire behavior.  The old
                # sequential loop serialized the whole bidi stream.
                with tracing.start_span(
                    f"rpc-stream/{getattr(self.req_handler, 'name', 'handler')}"
                ):
                    async for resp in handler_stream(request_iterator):
                        yield resp
                return
            async for req in request_iterator:
                yield await _traced_process(req, context)

        async def endpoint_discovery(request, context) -> bytes:
            import inspect

            eps = self.req_handler.endpoints()
            if inspect.isawaitable(eps):
                eps = await eps  # head handlers proxy discovery to shards
            from google.protobuf import json_format

            proto = marie_pb2.EndpointsProto()
            proto.endpoints.extend(eps["endpoints"])
            proto.write_endpoints.extend(eps.get("write_endpoints", []))
            json_format.ParseDict(eps.get("schemas", {}), proto.schemas)
            return proto.SerializeToString()

        async def status(request, context) -> bytes:
            # JinaInfoProto: map<string,string> (reference jina.proto:22-25)
            proto = marie_pb2.JinaInfoProto()
            for k, v in (self.req_handler.info() or {}).items():
                proto.jina[str(k)] = (
                    v if isinstance(v, str) else json.dumps(v)
                )
            return proto.SerializeToString()

        async def dry_run(request, context) -> bytes:
            st = marie_pb2.StatusProto()
            try:
                if hasattr(self.req_handler, "dry_run"):
                    await self.req_handler.dry_run()
                st.code = marie_pb2.StatusProto.SUCCESS
            except Exception as ex:  # noqa: BLE001
                st.code = marie_pb2.StatusProto.ERROR
                st.description = repr(ex)
            return st.SerializeToString()

        async def stream_doc(request: bytes, context):
            """JinaSingleDocumentRequestRPC.stream_doc parity
            (jina.proto:186-191): one document in, a stream of processed
            documents out."""
            from google.protobuf import json_format

            from marie_tpu.types.docs import Document, DocumentArray

            single = marie_pb2.SingleDocumentRequestProto()
            single.ParseFromString(request)
            req = DataRequest()
            if single.header.request_id:
                req.request_id = single.header.request_id
            if single.header.exec_endpoint:
                req.exec_endpoint = single.header.exec_endpoint
            if len(single.parameters.fields):
                req.parameters = json_format.MessageToDict(single.parameters)
            if len(single.document.data):
                req.docs = DocumentArray(
                    [Document.from_docarray_proto(single.document)]
                )
            handler_stream = getattr(
                self.req_handler, "process_single_doc_stream", None
            )
            if handler_stream is not None:
                # generator endpoints stream docs AS they are produced
                # (reference request_handling.py:1027 — one doc in,
                # several out, incrementally)
                async for doc in handler_stream(req):
                    out = marie_pb2.SingleDocumentRequestProto()
                    out.header.CopyFrom(req.proto.header)
                    out.parameters.CopyFrom(single.parameters)
                    doc.to_docarray_proto(out.document)
                    yield out.SerializeToString(deterministic=True)
                return
            resp = await _traced_process(req, context)
            for doc in resp.docs:
                out = marie_pb2.SingleDocumentRequestProto()
                out.header.CopyFrom(resp.proto.header)
                out.parameters.CopyFrom(single.parameters)
                doc.to_docarray_proto(out.document)
                yield out.SerializeToString(deterministic=True)

        async def snapshot(request: bytes, context) -> bytes:
            """JinaExecutorSnapshot parity: trigger executor snapshot."""
            import uuid

            proto = marie_pb2.SnapshotStatusProto()
            proto.id.value = uuid.uuid4().hex
            try:
                snapshot_file = f"/tmp/marie/snapshots/{proto.id.value}"
                import os

                os.makedirs(os.path.dirname(snapshot_file), exist_ok=True)
                self.req_handler.snapshot(snapshot_file)
                proto.status = marie_pb2.SnapshotStatusProto.SUCCEEDED
                proto.snapshot_file = snapshot_file
            except Exception as ex:  # noqa: BLE001
                self.logger.error(f"snapshot failed: {ex!r}")
                proto.status = marie_pb2.SnapshotStatusProto.FAILED
            self._record_status(
                self._snapshot_status, proto.id.value,
                bytes(proto.SerializeToString()),
            )
            return proto.SerializeToString()

        async def snapshot_status(request: bytes, context) -> bytes:
            """JinaExecutorSnapshotProgress parity (jina.proto:283-288)."""
            sid = marie_pb2.SnapshotId()
            sid.ParseFromString(request)
            known = self._snapshot_status.get(sid.value)
            if known is not None:
                return known
            proto = marie_pb2.SnapshotStatusProto()
            proto.id.value = sid.value
            proto.status = marie_pb2.SnapshotStatusProto.NOT_FOUND
            return proto.SerializeToString()

        async def restore_status(request: bytes, context) -> bytes:
            """JinaExecutorRestoreProgress parity (jina.proto:330)."""
            rid = marie_pb2.RestoreId()
            rid.ParseFromString(request)
            known = self._restore_status.get(rid.value)
            if known is not None:
                return known
            proto = marie_pb2.RestoreSnapshotStatusProto()
            proto.id.value = rid.value
            proto.status = marie_pb2.RestoreSnapshotStatusProto.NOT_FOUND
            return proto.SerializeToString()

        async def restore(request: bytes, context) -> bytes:
            """JinaExecutorRestore parity: restore executor state.

            The snapshot path is client-supplied; confine it to the
            server-side snapshot directory so the RPC cannot be used to
            read/load arbitrary server paths."""
            import os
            import uuid

            cmd = marie_pb2.RestoreSnapshotCommand()
            cmd.ParseFromString(request)
            proto = marie_pb2.RestoreSnapshotStatusProto()
            proto.id.value = uuid.uuid4().hex
            try:
                snapshot_dir = os.path.realpath("/tmp/marie/snapshots")
                resolved = os.path.realpath(cmd.snapshot_file)
                if not resolved.startswith(snapshot_dir + os.sep):
                    raise PermissionError(
                        f"restore path {cmd.snapshot_file!r} outside the "
                        f"snapshot directory"
                    )
                self.req_handler.restore(resolved)
                proto.status = marie_pb2.RestoreSnapshotStatusProto.SUCCEEDED
            except Exception as ex:  # noqa: BLE001
                self.logger.error(f"restore failed: {ex!r}")
                proto.status = marie_pb2.RestoreSnapshotStatusProto.FAILED
            self._record_status(
                self._restore_status, proto.id.value,
                bytes(proto.SerializeToString()),
            )
            return proto.SerializeToString()

        ident = lambda b: b  # noqa: E731 — raw-bytes (de)serializer

        async def _check_auth(context) -> None:
            """Abort UNAUTHENTICATED when keys are configured and the
            request carries no valid ``authorization: Bearer`` metadata
            (reference: TokenBearer guard, marie/auth/auth_bearer.py)."""
            from marie_tpu.auth import auth_enabled, validate_bearer

            if not auth_enabled():
                return
            md = dict(context.invocation_metadata() or ())
            if not validate_bearer(md.get("authorization")):
                await context.abort(
                    grpc.StatusCode.UNAUTHENTICATED,
                    "missing or invalid API key",
                )

        def unary(fn, req_de=ident, res_se=ident, guarded: bool = True):
            async def wrapped(request, context):
                if guarded:
                    await _check_auth(context)
                return await fn(request, context)

            return grpc.unary_unary_rpc_method_handler(
                wrapped, request_deserializer=req_de, response_serializer=res_se
            )

        services = {
            "jina.JinaDataRequestRPC": {
                "process_data": unary(
                    process_data, _req_list_deserializer, _req_serializer
                ),
            },
            "jina.JinaSingleDataRequestRPC": {
                "process_single_data": unary(
                    process_single_data, _req_deserializer, _req_serializer
                ),
            },
            "jina.JinaRPC": {
                "Call": grpc.stream_stream_rpc_method_handler(
                    _guard_stream(call_stream, _check_auth),
                    request_deserializer=_req_deserializer,
                    response_serializer=_req_serializer,
                ),
            },
            "jina.JinaSingleDocumentRequestRPC": {
                "stream_doc": grpc.unary_stream_rpc_method_handler(
                    _guard_unary_stream(stream_doc, _check_auth),
                ),
            },
            "jina.JinaDiscoverEndpointsRPC": {
                "endpoint_discovery": unary(endpoint_discovery),
            },
            "jina.JinaInfoRPC": {"_status": unary(status)},
            "jina.JinaGatewayDryRunRPC": {"dry_run": unary(dry_run)},
            "jina.JinaExecutorSnapshot": {"snapshot": unary(snapshot)},
            "jina.JinaExecutorSnapshotProgress": {
                "snapshot_status": unary(snapshot_status),
            },
            "jina.JinaExecutorRestore": {"restore": unary(restore)},
            "jina.JinaExecutorRestoreProgress": {
                "restore_status": unary(restore_status),
            },
            # health probes stay open so orchestrators can see readiness
            "grpc.health.v1.Health": {
                "Check": unary(self.health.check, guarded=False)
            },
        }
        for service_name, methods in services.items():
            self.server.add_generic_rpc_handlers(
                (grpc.method_handlers_generic_handler(service_name, methods),)
            )

        bound = self.server.add_insecure_port(f"{self.host}:{self.port}")
        if bound == 0:
            raise OSError(f"cannot bind gRPC server to {self.host}:{self.port}")
        self.port = bound
        await self.server.start()
        self.logger.debug(f"gRPC server serving on {self.host}:{self.port}")

    async def run_server(self) -> None:
        await self.server.wait_for_termination()

    async def shutdown(self) -> None:
        # the runtime owns the handler's lifecycle; servers only stop transport
        if self.server is not None:
            await self.server.stop(grace=1.0)

    @property
    def address(self) -> str:
        return f"{'127.0.0.1' if self.host == '0.0.0.0' else self.host}:{self.port}"
