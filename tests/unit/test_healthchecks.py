"""Health indicator framework (reference marie/healthchecks)."""

import asyncio
import sqlite3

from marie_tpu.healthchecks import (
    ScriptHealthIndicator,
    SqlHealthIndicator,
    TcpHealthIndicator,
    run_health_checks,
)


def test_sql_indicator_up_and_down():
    up = SqlHealthIndicator("db", lambda: sqlite3.connect(":memory:"))
    assert asyncio.run(up.check())["status"] == "UP"

    def boom():
        raise OSError("no database")

    down = SqlHealthIndicator("bad", boom)
    res = asyncio.run(down.check())
    assert res["status"] == "DOWN" and "no database" in res["error"]


def test_overall_status_aggregates():
    inds = [
        ScriptHealthIndicator("ok", lambda: True),
        SqlHealthIndicator("db", lambda: sqlite3.connect(":memory:")),
    ]
    rep = asyncio.run(run_health_checks(inds))
    assert rep["status"] == "UP" and len(rep["components"]) == 2

    inds.append(ScriptHealthIndicator("no", lambda: False))
    rep = asyncio.run(run_health_checks(inds))
    assert rep["status"] == "DOWN"


def test_tcp_indicator_down_fast():
    res = asyncio.run(TcpHealthIndicator("t", "127.0.0.1", 1).check())
    assert res["status"] == "DOWN"
