"""Structured logger (reference: /root/reference/marie/logging_core/logger.py).

Env knobs:
  MARIE_LOG_LEVEL   — DEBUG/INFO/WARNING/ERROR (default INFO)
  MARIE_LOG_FORMAT  — "rich" | "plain" | "json" (default plain)
  MARIE_LOG_CONFIG  — path to a YAML logging config (reference
                      ``resources/logging.default.yml`` shape: enabled
                      ``handlers`` list + per-handler ``configs`` with
                      format/formatter/output, top-level ``level``)
"""

import json
import logging
import os
import sys
import time
from typing import List, Optional

from marie_tpu.logging_core.mdc import MDC

_LOG_LEVEL_ENV = "MARIE_LOG_LEVEL"
_LOG_FORMAT_ENV = "MARIE_LOG_FORMAT"
_LOG_CONFIG_ENV = "MARIE_LOG_CONFIG"
_START_TIME = int(time.time())


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


def _formatter_for(name: str, fmt: Optional[str]) -> logging.Formatter:
    if (name or "").lower().startswith("json"):
        return _JsonFormatter()
    return logging.Formatter(
        fmt
        or "%(asctime)s %(levelname)-7s %(name)s [%(request_id)s] %(message)s",
        datefmt="%H:%M:%S",
    )


def handlers_from_config(path: str) -> Optional[List[logging.Handler]]:
    """Build handlers from a reference-shaped YAML logging config
    (``handlers:`` enabled list, ``configs:`` per-handler format/
    formatter/output; ``{uptime}`` in file paths expands to the process
    start timestamp).  Returns None when the file can't be used — the
    caller falls back to the env-driven default."""
    try:
        import yaml

        with open(path) as fp:
            cfg = yaml.safe_load(fp) or {}
        out: List[logging.Handler] = []
        enabled = cfg.get("handlers") or []
        configs = cfg.get("configs") or {}
        for name in enabled:
            hc = configs.get(name) or {}
            fmt = hc.get("format")
            formatter = _formatter_for(hc.get("formatter", ""), fmt)
            if name == "FileHandler":
                output = (hc.get("output") or "marie.log").replace(
                    "{uptime}", str(_START_TIME)
                )
                os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
                h: logging.Handler = logging.FileHandler(output)
                h.setFormatter(formatter)
            elif name == "RichHandler":
                try:
                    from rich.logging import RichHandler

                    h = RichHandler(rich_tracebacks=bool(
                        hc.get("rich_tracebacks", False)))
                except Exception:  # noqa: BLE001 — rich absent
                    h = logging.StreamHandler(sys.stderr)
                    h.setFormatter(formatter)
            else:  # StreamHandler and anything stream-like
                h = logging.StreamHandler(sys.stderr)
                h.setFormatter(formatter)
            out.append(h)
        if "level" in cfg:
            os.environ.setdefault(_LOG_LEVEL_ENV, str(cfg["level"]))
        return out or None
    except Exception:  # noqa: BLE001 — a broken config never kills boot
        return None


def _build_handlers() -> List[logging.Handler]:
    config_path = os.environ.get(_LOG_CONFIG_ENV)
    if config_path and os.path.exists(config_path):
        handlers = handlers_from_config(config_path)
        if handlers:
            return handlers
    return [_build_handler()]


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
            for handler in _build_handlers():
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
