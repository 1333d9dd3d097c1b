"""Durable SQL toast handler.

The reference persists events in PostgreSQL (``marie/messaging/psql_handler.py``);
same semantics over sqlite3 here (see SqliteKV for the rationale).
The RabbitMQ handler (``rabbit_handler.py``) requires pika and is gated in
``marie_tpu.messaging.rabbit_handler``.
"""

import json
import sqlite3
import threading
import time
from typing import Any, Dict, List


class SqliteToastHandler:
    def __init__(self, db_path: str = "/tmp/marie/events.db"):
        import os

        os.makedirs(os.path.dirname(db_path) or ".", exist_ok=True)
        self.db_path = db_path
        self._local = threading.local()
        conn = self._conn()
        conn.execute(
            "CREATE TABLE IF NOT EXISTS events ("
            "id INTEGER PRIMARY KEY AUTOINCREMENT, ts REAL, event TEXT, "
            "job_id TEXT, payload TEXT)"
        )
        conn.commit()

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = sqlite3.connect(self.db_path, timeout=30)
            conn.execute("PRAGMA journal_mode=WAL")
            self._local.conn = conn
        return conn

    def notify(self, event: str, notification: Dict[str, Any], **kwargs) -> None:
        conn = self._conn()
        conn.execute(
            "INSERT INTO events (ts, event, job_id, payload) VALUES (?,?,?,?)",
            (
                time.time(),
                event,
                notification.get("job_id", ""),
                json.dumps(notification),
            ),
        )
        conn.commit()

    def events_for(self, job_id: str) -> List[Dict[str, Any]]:
        rows = self._conn().execute(
            "SELECT event, payload FROM events WHERE job_id=? ORDER BY id",
            (job_id,),
        ).fetchall()
        return [
            {"event": e, **json.loads(p)} for e, p in rows
        ]
