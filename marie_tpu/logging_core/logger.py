"""Structured logger (reference: /root/reference/marie/logging_core/logger.py).

Env knobs:
  MARIE_LOG_LEVEL   — DEBUG/INFO/WARNING/ERROR (default INFO)
  MARIE_LOG_FORMAT  — "rich" | "plain" | "json" (default plain)
"""

import json
import logging
import os
import sys
import time
from typing import Optional

from marie_tpu.logging_core.mdc import MDC

_LOG_LEVEL_ENV = "MARIE_LOG_LEVEL"
_LOG_FORMAT_ENV = "MARIE_LOG_FORMAT"


class _MDCFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        record.request_id = MDC.get("request_id", "-")
        return True


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": round(record.created, 3),
            "level": record.levelname,
            "name": record.name,
            "msg": record.getMessage(),
            "request_id": getattr(record, "request_id", "-"),
        }
        if record.exc_info:
            payload["exc"] = self.formatException(record.exc_info)
        return json.dumps(payload)


def _build_handler() -> logging.Handler:
    fmt = os.environ.get(_LOG_FORMAT_ENV, "plain").lower()
    if fmt == "json":
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(_JsonFormatter())
        return h
    if fmt == "rich":
        try:
            from rich.logging import RichHandler

            return RichHandler(rich_tracebacks=True, show_path=False)
        except Exception:  # noqa: BLE001 — fall back to plain
            pass
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(
        logging.Formatter(
            "%(asctime)s %(levelname)-7s %(name)s [%(request_id)s] %(message)s",
            datefmt="%H:%M:%S",
        )
    )
    return h


class MarieLogger:
    """Thin wrapper over :mod:`logging` with MDC request-id injection."""

    def __init__(self, context: str = "marie", log_level: Optional[str] = None):
        self.logger = logging.getLogger(context)
        self.logger.propagate = False
        if not self.logger.handlers:
            handler = _build_handler()
            handler.addFilter(_MDCFilter())
            self.logger.addHandler(handler)
        level = log_level or os.environ.get(_LOG_LEVEL_ENV, "INFO")
        self.logger.setLevel(level.upper())

    # pass-throughs
    def debug(self, msg, *args, **kw):
        self.logger.debug(msg, *args, **kw)

    def info(self, msg, *args, **kw):
        self.logger.info(msg, *args, **kw)

    def warning(self, msg, *args, **kw):
        self.logger.warning(msg, *args, **kw)

    def error(self, msg, *args, **kw):
        self.logger.error(msg, *args, **kw)

    def critical(self, msg, *args, **kw):
        self.logger.critical(msg, *args, **kw)

    def exception(self, msg, *args, **kw):
        self.logger.exception(msg, *args, **kw)

    def success(self, msg, *args, **kw):
        self.logger.info("✓ " + str(msg), *args, **kw)

    def close(self):
        for h in list(self.logger.handlers):
            h.close()
            self.logger.removeHandler(h)

    @property
    def handlers(self):
        return self.logger.handlers


default_logger = MarieLogger("marie")
