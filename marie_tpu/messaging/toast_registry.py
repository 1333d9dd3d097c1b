"""Toast — the event-notification bus.

Parity with the reference (``/root/reference/marie/messaging/toast_registry.py:10,72``):
async handlers register per event-type prefix ('*' = all); ``Toast.notify``
fans an event out to every matching handler.
"""

import asyncio
from typing import Any, Dict, List, Optional

from marie_tpu.logging_core import MarieLogger


class Toast:
    _handlers: Dict[str, List[Any]] = {}
    logger = MarieLogger("Toast")

    @classmethod
    def register(cls, handler, native: bool = False, event: str = "*") -> None:
        cls._handlers.setdefault(event, []).append(handler)

    @classmethod
    def unregister_all(cls) -> None:
        cls._handlers.clear()

    @classmethod
    def _matching(cls, event: str) -> List[Any]:
        out = []
        for pattern, handlers in cls._handlers.items():
            if pattern == "*" or event.startswith(pattern):
                out.extend(handlers)
        return out

    @classmethod
    async def notify(cls, event: str, notification: Dict[str, Any], **kwargs) -> None:
        for handler in cls._matching(event):
            try:
                result = handler.notify(event, notification, **kwargs)
                if asyncio.iscoroutine(result):
                    await result
            except Exception as ex:  # noqa: BLE001 — events must not break the flow
                cls.logger.error(f"toast handler {handler} failed: {ex!r}")

    @classmethod
    def notify_sync(cls, event: str, notification: Dict[str, Any], **kwargs) -> None:
        from marie_tpu.helper import run_async

        run_async(cls.notify(event, notification, **kwargs))
