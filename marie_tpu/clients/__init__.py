"""Client — gRPC/HTTP/WebSocket clients with ``post()`` (reference:
``/root/reference/marie/clients/__init__.py``)."""

from typing import Optional

from marie_tpu.clients.grpc_client import GRPCClient
from marie_tpu.clients.http_client import HTTPClient
from marie_tpu.clients.websocket_client import WebSocketClient


def Client(
    host: str = "127.0.0.1",
    port: Optional[int] = None,
    protocol: str = "grpc",
    asyncio: bool = False,
    **kwargs,
):
    """Factory returning the protocol-appropriate client."""
    protocol = protocol.lower()
    if protocol == "grpc":
        return GRPCClient(host=host, port=port, **kwargs)
    if protocol == "websocket":
        return WebSocketClient(host=host, port=port, **kwargs)
    if protocol == "http":
        return HTTPClient(host=host, port=port, **kwargs)
    raise ValueError(f"unknown protocol {protocol!r}")


__all__ = ["Client", "GRPCClient", "HTTPClient", "WebSocketClient"]
