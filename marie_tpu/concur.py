"""Fixed-rate async scheduler (reference:
``/root/reference/marie/concur/ScheduledExecutorService.py``)."""

import asyncio
from typing import Awaitable, Callable, Dict, Optional

from marie_tpu.logging_core import MarieLogger


class ScheduledExecutorService:
    """Schedule coroutines at fixed rates; survive handler exceptions."""

    def __init__(self):
        self.logger = MarieLogger("scheduler-service")
        self._tasks: Dict[str, asyncio.Task] = {}

    def schedule_at_fixed_rate(
        self,
        name: str,
        fn: Callable[[], Awaitable[None]],
        interval: float,
        initial_delay: float = 0.0,
    ) -> None:
        if name in self._tasks:
            raise ValueError(f"task {name!r} already scheduled")

        async def _loop():
            await asyncio.sleep(initial_delay)
            while True:
                try:
                    await fn()
                except asyncio.CancelledError:
                    raise
                except Exception as ex:  # noqa: BLE001 — keep the schedule alive
                    self.logger.error(f"scheduled task {name} failed: {ex!r}")
                await asyncio.sleep(interval)

        self._tasks[name] = asyncio.create_task(_loop())

    def cancel(self, name: str) -> bool:
        task = self._tasks.pop(name, None)
        if task is None:
            return False
        task.cancel()
        return True

    def shutdown(self) -> None:
        for name in list(self._tasks):
            self.cancel(name)
