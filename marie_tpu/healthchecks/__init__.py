"""Component health indicators (reference: ``marie/healthchecks/`` —
tcp/http/script probes feeding /health/status)."""

import asyncio
import socket
from typing import Any, Callable, Dict, List


class HealthIndicator:
    def __init__(self, name: str):
        self.name = name

    async def check(self) -> Dict[str, Any]:
        raise NotImplementedError


class TcpHealthIndicator(HealthIndicator):
    def __init__(self, name: str, host: str, port: int, timeout: float = 2.0):
        super().__init__(name)
        self.host, self.port, self.timeout = host, port, timeout

    async def check(self) -> Dict[str, Any]:
        try:
            _, writer = await asyncio.wait_for(
                asyncio.open_connection(self.host, self.port), self.timeout
            )
            writer.close()
            return {"name": self.name, "status": "UP"}
        except Exception as ex:  # noqa: BLE001
            return {"name": self.name, "status": "DOWN", "error": repr(ex)}


class HttpHealthIndicator(HealthIndicator):
    def __init__(self, name: str, url: str, timeout: float = 2.0):
        super().__init__(name)
        self.url, self.timeout = url, timeout

    async def check(self) -> Dict[str, Any]:
        try:
            import aiohttp

            async with aiohttp.ClientSession() as s:
                async with s.get(
                    self.url, timeout=aiohttp.ClientTimeout(total=self.timeout)
                ) as r:
                    status = "UP" if r.status < 500 else "DOWN"
                    return {"name": self.name, "status": status, "code": r.status}
        except Exception as ex:  # noqa: BLE001
            return {"name": self.name, "status": "DOWN", "error": repr(ex)}


class ScriptHealthIndicator(HealthIndicator):
    def __init__(self, name: str, fn: Callable[[], bool]):
        super().__init__(name)
        self.fn = fn

    async def check(self) -> Dict[str, Any]:
        try:
            ok = self.fn()
            return {"name": self.name, "status": "UP" if ok else "DOWN"}
        except Exception as ex:  # noqa: BLE001
            return {"name": self.name, "status": "DOWN", "error": repr(ex)}


class SqlHealthIndicator(HealthIndicator):
    """``SELECT 1`` over an injected DB-API connection factory
    (reference ``marie/healthchecks/sql`` probe)."""

    def __init__(self, name: str, connection_factory: Callable):
        super().__init__(name)
        self.connection_factory = connection_factory

    async def check(self) -> Dict[str, Any]:
        try:
            conn = self.connection_factory()
            try:
                cur = conn.cursor() if hasattr(conn, "cursor") else conn
                cur.execute("SELECT 1")
                row = cur.fetchone()
                ok = row is not None
            finally:
                if hasattr(conn, "close"):
                    conn.close()
            return {"name": self.name, "status": "UP" if ok else "DOWN"}
        except Exception as ex:  # noqa: BLE001
            return {"name": self.name, "status": "DOWN", "error": repr(ex)}


async def run_health_checks(indicators: List[HealthIndicator]) -> Dict[str, Any]:
    results = await asyncio.gather(*(i.check() for i in indicators))
    overall = "UP" if all(r["status"] == "UP" for r in results) else "DOWN"
    return {"status": overall, "components": list(results)}
