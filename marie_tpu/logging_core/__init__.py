from marie_tpu.logging_core.logger import MarieLogger, default_logger
from marie_tpu.logging_core.mdc import MDC
from marie_tpu.logging_core.profile import TimeContext, profiling

__all__ = ["MarieLogger", "default_logger", "MDC", "TimeContext", "profiling"]
