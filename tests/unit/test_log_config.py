"""YAML-driven logging config (reference resources/logging.default.yml +
JINA_LOG_CONFIG env semantics)."""

import json
import logging
import os

from marie_tpu.logging_core.logger import MarieLogger, handlers_from_config


def test_handlers_from_config_file_and_stream(tmp_path):
    log_file = tmp_path / "out" / "m-{uptime}.log"
    cfg = tmp_path / "log.yml"
    cfg.write_text(
        "handlers:\n"
        "  - StreamHandler\n"
        "  - FileHandler\n"
        "level: DEBUG\n"
        "configs:\n"
        "  FileHandler:\n"
        f"    output: '{log_file}'\n"
        "    formatter: JsonFormatter\n"
        "  StreamHandler:\n"
        "    format: '%(levelname)s|%(message)s'\n"
    )
    handlers = handlers_from_config(str(cfg))
    assert len(handlers) == 2
    kinds = {type(h).__name__ for h in handlers}
    assert "FileHandler" in kinds and "StreamHandler" in kinds


def test_log_config_env_end_to_end(tmp_path, monkeypatch):
    out = tmp_path / "app.log"
    cfg = tmp_path / "log.yml"
    cfg.write_text(
        "handlers:\n  - FileHandler\nconfigs:\n  FileHandler:\n"
        f"    output: '{out}'\n    formatter: JsonFormatter\n"
    )
    monkeypatch.setenv("MARIE_LOG_CONFIG", str(cfg))
    monkeypatch.setenv("MARIE_LOG_LEVEL", "INFO")  # conftest defaults WARNING
    logger = MarieLogger("cfg-test-unique")
    logger.info("hello from yaml config")
    logger.close()
    lines = out.read_text().strip().splitlines()
    rec = json.loads(lines[-1])
    assert rec["msg"] == "hello from yaml config"
    assert rec["level"] == "INFO"
    assert "request_id" in rec


def test_broken_config_falls_back(tmp_path, monkeypatch):
    cfg = tmp_path / "bad.yml"
    cfg.write_text("handlers: {not: [valid")
    monkeypatch.setenv("MARIE_LOG_CONFIG", str(cfg))
    logger = MarieLogger("cfg-test-fallback")
    assert logger.handlers  # env-default handler attached, no raise
    logger.info("still logs")
    logger.close()


def test_shipped_default_config_parses():
    import marie_tpu

    path = os.path.join(
        os.path.dirname(marie_tpu.__file__), "resources", "logging.default.yml"
    )
    handlers = handlers_from_config(path)
    assert handlers and isinstance(handlers[0], logging.StreamHandler)
