from marie_tpu.messaging.toast_registry import Toast
from marie_tpu.messaging.publisher import (
    mark_as_complete,
    mark_as_failed,
    mark_as_scheduled,
    mark_as_started,
)

__all__ = [
    "Toast",
    "mark_as_scheduled",
    "mark_as_started",
    "mark_as_failed",
    "mark_as_complete",
]
