"""Profiling helpers (reference: /root/reference/marie/logging_core/profile.py).

``TimeContext`` times a block; ``TimeContextTPU`` additionally calls
``jax.block_until_ready`` on provided outputs so on-device async dispatch
is actually measured (the TPU analog of the reference's CUDA-event based
``TimeContextCuda``).
"""

import functools
import time
from typing import Any, Callable, Optional

from marie_tpu.logging_core.logger import MarieLogger, default_logger


class TimeContext:
    """``with TimeContext('loading model'):`` prints elapsed time on exit."""

    def __init__(self, task_name: str, logger: Optional[MarieLogger] = None):
        self.task_name = task_name
        self._logger = logger or default_logger
        self.duration = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.duration = time.perf_counter() - self.start
        self._logger.info(f"{self.task_name} took {self.duration:.3f}s")
        return False

    def now(self) -> float:
        return time.perf_counter() - self.start


class TimeContextTPU(TimeContext):
    """Time a block that launches async TPU work.

    Usage::

        with TimeContextTPU('detect', outputs_fn=lambda: [heatmap]):
            heatmap = detector(page)
    """

    def __init__(self, task_name, logger=None, outputs_fn: Optional[Callable] = None):
        super().__init__(task_name, logger)
        self._outputs_fn = outputs_fn

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is None and self._outputs_fn is not None:
            import jax

            jax.block_until_ready(self._outputs_fn())
        return super().__exit__(exc_type, exc_val, exc_tb)


def profiling(func: Callable) -> Callable:
    """Decorator logging wall time of every call at DEBUG level."""

    @functools.wraps(func)
    def _wrapper(*args: Any, **kwargs: Any):
        t0 = time.perf_counter()
        try:
            return func(*args, **kwargs)
        finally:
            default_logger.debug(
                f"{func.__qualname__} took {time.perf_counter() - t0:.4f}s"
            )

    return _wrapper
