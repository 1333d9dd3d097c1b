"""GrpcConnectionPool — async client pool with replica balancing + retries.

Parity with the reference (``/root/reference/marie/serve/networking/__init__.py:50``):
per-deployment replica lists, round-robin / least-connection balancing,
retry on UNAVAILABLE / DEADLINE_EXCEEDED / NOT_FOUND with channel reset
and replica failover (``_handle_aiorpcerror`` :375-449 semantics).
"""

import asyncio
import itertools
from typing import Dict, List, Optional, Sequence

import grpc

from marie_tpu.excepts import EstablishGrpcConnectionError, InternalNetworkError
from marie_tpu.logging_core import MarieLogger
from marie_tpu.types.request import DataRequest

RETRYABLE_CODES = (
    grpc.StatusCode.UNAVAILABLE,
    grpc.StatusCode.DEADLINE_EXCEEDED,
    grpc.StatusCode.NOT_FOUND,
)

_MAX_MSG = 64 * 1024 * 1024
_CHANNEL_OPTIONS = [
    ("grpc.max_send_message_length", _MAX_MSG),
    ("grpc.max_receive_message_length", _MAX_MSG),
]

_PROCESS_DATA = "/jina.JinaDataRequestRPC/process_data"
_DISCOVER = "/jina.JinaDiscoverEndpointsRPC/endpoint_discovery"


class _Replica:
    def __init__(self, address: str):
        self.address = address
        self.channel: Optional[grpc.aio.Channel] = None
        self.in_flight = 0

    def get_channel(self) -> grpc.aio.Channel:
        if self.channel is None:
            self.channel = grpc.aio.insecure_channel(
                self.address, options=_CHANNEL_OPTIONS
            )
        return self.channel

    async def reset(self) -> None:
        if self.channel is not None:
            await self.channel.close()
            self.channel = None

    async def close(self) -> None:
        await self.reset()


class _ReplicaList:
    def __init__(self, balancer: str = "round_robin"):
        self.replicas: List[_Replica] = []
        self.balancer = balancer
        self._rr = itertools.count()

    def add(self, address: str) -> None:
        if address not in [r.address for r in self.replicas]:
            self.replicas.append(_Replica(address))

    def remove(self, address: str) -> None:
        self.replicas = [r for r in self.replicas if r.address != address]

    def pick(self) -> _Replica:
        if not self.replicas:
            raise EstablishGrpcConnectionError("no replicas available")
        if self.balancer == "least_connection":
            return min(self.replicas, key=lambda r: r.in_flight)
        return self.replicas[next(self._rr) % len(self.replicas)]

    async def close(self) -> None:
        for r in self.replicas:
            await r.close()


class GrpcConnectionPool:
    def __init__(self, balancer: str = "round_robin", retries: int = 3):
        self.logger = MarieLogger("GrpcConnectionPool")
        self.balancer = balancer
        self.retries = retries
        self._deployments: Dict[str, _ReplicaList] = {}

    # --- topology management ------------------------------------------
    def add_connection(self, deployment: str, address: str) -> None:
        self._deployments.setdefault(
            deployment, _ReplicaList(self.balancer)
        ).add(address)

    def remove_connection(self, deployment: str, address: str) -> None:
        if deployment in self._deployments:
            self._deployments[deployment].remove(address)

    def deployments(self) -> List[str]:
        return list(self._deployments)

    def addresses(self, deployment: str) -> List[str]:
        rl = self._deployments.get(deployment)
        return [r.address for r in rl.replicas] if rl else []

    # --- request send --------------------------------------------------
    async def send_requests_once(
        self,
        requests: Sequence[DataRequest],
        deployment: str,
        timeout: Optional[float] = None,
        endpoint: Optional[str] = None,
    ) -> DataRequest:
        """Send to one replica of a deployment with retry/failover."""
        rl = self._deployments.get(deployment)
        if rl is None or not rl.replicas:
            raise EstablishGrpcConnectionError(
                f"no connections for deployment {deployment!r}"
            )
        req = requests[0]
        if endpoint:
            req.exec_endpoint = endpoint

        last_error: Optional[BaseException] = None
        max_attempts = max(self.retries, self.retries * max(len(rl.replicas), 1))
        for attempt in range(max_attempts):
            replica = rl.pick()
            replica.in_flight += 1
            try:
                channel = replica.get_channel()
                from marie_tpu.types.request import to_request_list_bytes

                stub = channel.unary_unary(
                    _PROCESS_DATA,
                    request_serializer=lambda r: to_request_list_bytes([r]),
                    response_deserializer=DataRequest.from_bytes,
                )
                from marie_tpu.serve.instrumentation import tracing

                resp = await stub(
                    req, timeout=timeout,
                    metadata=tracing.inject_metadata(None) or None,
                )
                if (
                    resp.is_error()
                    and resp.proto.header.status.exception.executor == "raft"
                    and attempt + 1 < self.retries * len(rl.replicas)
                ):
                    # follower answered "not the leader" — try another
                    # replica (reference follow-up, networking/__init__.py:399)
                    self.logger.debug(
                        f"{deployment}@{replica.address} is not the raft "
                        "leader; retrying next replica"
                    )
                    # reset status for the retry
                    resp.proto.header.status.Clear()
                    req = resp
                    continue
                return resp
            except asyncio.CancelledError:
                # grpc.aio corner case: a call whose channel dies right
                # after creation surfaces as CancelledError even though
                # nobody cancelled US (grpc/aio/_call.py "locally
                # cancelled").  Re-raise only for genuine external
                # cancellation; otherwise treat as a failed attempt.
                cur = asyncio.current_task()
                if cur is not None and cur.cancelling():
                    raise
                last_error = EstablishGrpcConnectionError(
                    f"rpc locally cancelled for {deployment}@{replica.address}"
                )
                await replica.reset()
                await asyncio.sleep(min(0.05 * (2**attempt), 1.0))
                continue
            except grpc.aio.AioRpcError as ex:
                last_error = ex
                if ex.code() in RETRYABLE_CODES:
                    self.logger.warning(
                        f"{deployment}@{replica.address} failed with "
                        f"{ex.code().name}; retry {attempt + 1}/{self.retries}"
                    )
                    await replica.reset()
                    await asyncio.sleep(min(0.05 * (2**attempt), 1.0))
                    continue
                raise InternalNetworkError(
                    ex, request_id=req.request_id, details=ex.details()
                )
            finally:
                replica.in_flight -= 1
        raise InternalNetworkError(
            last_error,
            request_id=req.request_id,
            details=f"exhausted {self.retries} retries for {deployment}",
        )

    async def stream_single_doc(
        self,
        request,
        deployment: str,
        timeout: Optional[float] = None,
    ):
        """Proxy one ``stream_doc`` call to a replica, yielding response
        protos as the worker produces them.  Connect-phase failures
        fail over to another replica; once the first document has been
        yielded the stream is committed (re-running a generator endpoint
        could duplicate side effects)."""
        rl = self._deployments.get(deployment)
        if rl is None or not rl.replicas:
            raise EstablishGrpcConnectionError(
                f"no connections for deployment {deployment!r}"
            )
        from marie_tpu.proto import marie_pb2

        last_error: Optional[BaseException] = None
        for attempt in range(max(self.retries, 1)):
            replica = rl.pick()
            replica.in_flight += 1
            started = False
            try:
                channel = replica.get_channel()
                stub = channel.unary_stream(
                    "/jina.JinaSingleDocumentRequestRPC/stream_doc",
                    request_serializer=lambda m: m.SerializeToString(),
                    response_deserializer=(
                        marie_pb2.SingleDocumentRequestProto.FromString
                    ),
                )
                async for item in stub(request, timeout=timeout):
                    started = True
                    yield item
                return
            except grpc.aio.AioRpcError as ex:
                last_error = ex
                if started or ex.code() not in RETRYABLE_CODES:
                    raise InternalNetworkError(
                        ex,
                        request_id=request.header.request_id,
                        details=ex.details(),
                    )
                self.logger.warning(
                    f"stream_doc to {deployment}@{replica.address} failed "
                    f"with {ex.code().name}; retry {attempt + 1}/{self.retries}"
                )
                await replica.reset()
                await asyncio.sleep(min(0.05 * (2**attempt), 1.0))
            finally:
                replica.in_flight -= 1
        raise InternalNetworkError(
            last_error,
            request_id=request.header.request_id,
            details=f"exhausted {self.retries} retries for {deployment}",
        )

    async def send_discover_endpoint(
        self, deployment: str, timeout: Optional[float] = 5.0
    ) -> dict:
        import json

        from marie_tpu.proto import marie_pb2

        rl = self._deployments.get(deployment)
        if rl is None or not rl.replicas:
            raise EstablishGrpcConnectionError(
                f"no connections for deployment {deployment!r}"
            )
        replica = rl.pick()
        channel = replica.get_channel()
        stub = channel.unary_unary(
            _DISCOVER,
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        raw = await stub(b"", timeout=timeout)
        proto = marie_pb2.EndpointsProto()
        proto.ParseFromString(raw)
        from google.protobuf import json_format

        return {
            "endpoints": list(proto.endpoints),
            "write_endpoints": list(proto.write_endpoints),
            "schemas": json_format.MessageToDict(proto.schemas),
        }

    async def close(self) -> None:
        for rl in self._deployments.values():
            await rl.close()
        self._deployments.clear()
