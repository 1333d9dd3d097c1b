"""gRPC client (reference: ``/root/reference/marie/clients/base/grpc.py:25``)."""

import asyncio
from typing import Any, Dict, List, Optional, Union

import grpc

from marie_tpu.excepts import BadServer
from marie_tpu.helper import run_async
from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.docs import Document, DocumentArray
from marie_tpu.types.request import DataRequest

_PROCESS_DATA = "/jina.JinaDataRequestRPC/process_data"
_DRY_RUN = "/jina.JinaGatewayDryRunRPC/dry_run"
_INFO = "/jina.JinaInfoRPC/_status"

_MAX_MSG = 64 * 1024 * 1024
_OPTIONS = [
    ("grpc.max_send_message_length", _MAX_MSG),
    ("grpc.max_receive_message_length", _MAX_MSG),
]


class GRPCClient:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: Optional[int] = None,
        api_key: Optional[str] = None,
        compression: Optional[str] = None,
        **kwargs,
    ):
        if port is None:
            raise ValueError("port is required")
        self.address = f"{host}:{port}"
        self.logger = MarieLogger("GRPCClient")
        # sent as `authorization: Bearer <key>` metadata on every RPC
        # (reference TokenBearer guard, marie/auth/auth_bearer.py:11)
        self._metadata = (
            (("authorization", f"Bearer {api_key}"),) if api_key else None
        )
        # channel-default message compression ("Gzip" / "Deflate" /
        # "NoCompression" — reference clients/base/grpc.py:76)
        self._compression = (
            getattr(grpc.Compression, compression) if compression else None
        )

    def _channel(self):
        return grpc.aio.insecure_channel(
            self.address, options=_OPTIONS, compression=self._compression
        )

    # --- async API ----------------------------------------------------
    async def apost(
        self,
        on: str = "/",
        inputs: Union[DocumentArray, List[Document], None] = None,
        parameters: Optional[Dict[str, Any]] = None,
        target_executor: str = "",
        timeout: Optional[float] = None,
        return_responses: bool = False,
        request_size: int = 0,
        max_attempts: int = 1,
        initial_backoff: float = 0.1,
        max_backoff: float = 2.0,
        backoff_multiplier: float = 1.5,
        on_done=None,
        on_error=None,
        on_always=None,
        continue_on_error: bool = False,
    ):
        """Post docs to an endpoint (reference ``Client.post`` semantics).

        ``inputs`` accepts a DocumentArray, list, or lazy generator;
        ``request_size`` > 0 chunks it into that many docs per request.
        Transient RPC failures (UNAVAILABLE / DEADLINE_EXCEEDED) retry up
        to ``max_attempts`` with exponential backoff (the reference's
        ``max_attempts``/``initial_backoff``/``backoff_multiplier`` args).
        Callbacks mirror the reference: ``on_done(resp)`` per successful
        request, ``on_error(resp)`` per failed one (suppresses the raise),
        ``on_always(resp)`` after each.  With ``return_responses`` a single
        un-chunked call returns the response object; chunked calls return
        the list of responses.
        """
        import asyncio as _asyncio

        from marie_tpu.clients.helper import as_docarray, chunk_docs
        from marie_tpu.serve.instrumentation import tracing

        chunks = chunk_docs(as_docarray(inputs), request_size)
        responses: List[DataRequest] = []
        async with self._channel() as ch:
            from marie_tpu.types.request import to_request_list_bytes

            stub = ch.unary_unary(
                _PROCESS_DATA,
                request_serializer=lambda r: to_request_list_bytes([r]),
                response_deserializer=DataRequest.from_bytes,
            )
            for chunk in chunks:
                req = DataRequest.from_docs(
                    chunk,
                    endpoint=on,
                    parameters=parameters,
                    target_executor=target_executor,
                )
                backoff = initial_backoff
                attempt = 0
                while True:
                    attempt += 1
                    try:
                        with tracing.start_span(
                            "client/post",
                            {"endpoint": on, "request_id": req.request_id},
                        ):
                            resp: DataRequest = await stub(
                                req, timeout=timeout,
                                metadata=tracing.inject_metadata(self._metadata)
                                or None,
                            )
                        break
                    except grpc.aio.AioRpcError as ex:
                        retriable = ex.code() in (
                            grpc.StatusCode.UNAVAILABLE,
                            grpc.StatusCode.DEADLINE_EXCEEDED,
                        )
                        if not retriable or attempt >= max_attempts:
                            raise
                        self.logger.warning(
                            f"retrying after {ex.code().name} "
                            f"(attempt {attempt}/{max_attempts})"
                        )
                        await _asyncio.sleep(backoff)
                        backoff = min(backoff * backoff_multiplier, max_backoff)
                if resp.is_error():
                    if on_error is not None:
                        on_error(resp)
                    elif not continue_on_error:
                        st = resp.proto.header.status
                        raise BadServer(
                            f"request failed in "
                            f"{st.exception.executor or 'server'}: "
                            f"{st.description}"
                        )
                elif on_done is not None:
                    on_done(resp)
                if on_always is not None:
                    on_always(resp)
                responses.append(resp)
        if return_responses:
            return responses if len(responses) > 1 else responses[0]
        out = DocumentArray()
        for resp in responses:
            for d in resp.docs:
                out.append(d)
        return out

    async def adry_run(self, timeout: float = 5.0) -> bool:
        from marie_tpu.proto import marie_pb2

        async with self._channel() as ch:
            stub = ch.unary_unary(
                _DRY_RUN,
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            raw = await stub(b"", timeout=timeout, metadata=self._metadata)
        st = marie_pb2.StatusProto()
        st.ParseFromString(raw)
        return st.code == marie_pb2.StatusProto.SUCCESS

    async def ainfo(self, timeout: float = 5.0) -> dict:
        import json

        from marie_tpu.proto import marie_pb2

        async with self._channel() as ch:
            stub = ch.unary_unary(
                _INFO,
                request_serializer=lambda b: b,
                response_deserializer=lambda b: b,
            )
            raw = await stub(b"", timeout=timeout, metadata=self._metadata)
        proto = marie_pb2.JinaInfoProto()
        proto.ParseFromString(raw)

        def _maybe_json(v):
            try:
                return json.loads(v)
            except (ValueError, TypeError):
                return v

        return {k: _maybe_json(v) for k, v in proto.jina.items()}

    async def astream(
        self,
        requests_iter,
        timeout: Optional[float] = None,
        results_in_order: bool = False,
    ):
        """Bidirectional streaming over ``jina.JinaRPC/Call`` — responses
        come in completion order; ``results_in_order`` asks the gateway
        to yield them in submission order instead (reference
        ``results_in_order``)."""
        if results_in_order:
            def _mark(reqs):
                for r in reqs:
                    params = r.parameters
                    params["__results_in_order__"] = True
                    r.parameters = params
                    yield r

            requests_iter = _mark(requests_iter)
        async with self._channel() as ch:
            stub = ch.stream_stream(
                "/jina.JinaRPC/Call",
                request_serializer=lambda r: r.to_bytes(),
                response_deserializer=DataRequest.from_bytes,
            )
            call = stub(requests_iter, timeout=timeout, metadata=self._metadata)
            async for resp in call:
                yield resp

    async def astream_doc(
        self,
        on: str,
        doc: Document,
        parameters: Optional[Dict[str, Any]] = None,
        timeout: Optional[float] = None,
    ):
        """One document in → a stream of documents out, yielded as the
        server produces them (``JinaSingleDocumentRequestRPC/stream_doc``
        — generator executor endpoints; reference client stream_doc,
        marie/clients/base/grpc.py)."""
        import json as _json

        from marie_tpu.proto import marie_pb2

        from google.protobuf import json_format as _json_format

        sreq = marie_pb2.SingleDocumentRequestProto()
        sreq.header.exec_endpoint = on
        _json_format.ParseDict(parameters or {}, sreq.parameters)
        doc.to_docarray_proto(sreq.document)
        async with self._channel() as ch:
            stub = ch.unary_stream(
                "/jina.JinaSingleDocumentRequestRPC/stream_doc",
                request_serializer=lambda m: m.SerializeToString(),
                response_deserializer=(
                    marie_pb2.SingleDocumentRequestProto.FromString
                ),
            )
            async for resp in stub(sreq, timeout=timeout, metadata=self._metadata):
                yield Document.from_docarray_proto(resp.document)

    async def aprofiling(self, timeout: Optional[float] = None) -> Dict[str, Any]:
        """Round-trip latency breakdown (reference ProfileMixin.profiling):
        total client latency + per-executor time from the response routes."""
        import time as _time
        from datetime import datetime

        req = DataRequest.from_docs(DocumentArray(), endpoint="/")
        t0 = _time.perf_counter()
        async with self._channel() as ch:
            from marie_tpu.types.request import to_request_list_bytes

            stub = ch.unary_unary(
                _PROCESS_DATA,
                request_serializer=lambda r: to_request_list_bytes([r]),
                response_deserializer=DataRequest.from_bytes,
            )
            # an error response still carries routes — profiling measures
            # latency, not endpoint success
            resp: DataRequest = await stub(req, timeout=timeout, metadata=self._metadata)
        total = _time.perf_counter() - t0
        from marie_tpu.types.request import ts_iso

        routes = {}
        for r in resp.routes:
            try:
                start = datetime.fromisoformat(ts_iso(r.start_time))
                end = datetime.fromisoformat(ts_iso(r.end_time))
                routes[r.executor] = (end - start).total_seconds()
            except ValueError:
                routes[r.executor] = None
        network = total - sum(v for v in routes.values() if v)
        return {
            "total_seconds": round(total, 6),
            "executors": routes,
            "network_and_gateway_seconds": round(max(network, 0.0), 6),
        }

    # --- sync wrappers -------------------------------------------------
    def post(self, on: str = "/", inputs=None, **kwargs):
        return run_async(self.apost(on=on, inputs=inputs, **kwargs))

    def profiling(self, **kwargs) -> Dict[str, Any]:
        return run_async(self.aprofiling(**kwargs))

    def dry_run(self, **kwargs) -> bool:
        return run_async(self.adry_run(**kwargs))

    # reference-API aliases (marie Client.is_flow_ready)
    async def is_flow_ready(self, **kwargs) -> bool:
        try:
            return await self.adry_run(**kwargs)
        except Exception:  # noqa: BLE001 — readiness probe never raises
            return False

    def flow_ready(self, **kwargs) -> bool:
        return run_async(self.is_flow_ready(**kwargs))

    def info(self, **kwargs) -> dict:
        return run_async(self.ainfo(**kwargs))
