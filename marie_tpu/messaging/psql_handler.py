"""PostgreSQL toast handler (reference: marie/messaging/psql_handler.py —
events persisted into a ``message_events`` table).

DB-API portable: with psycopg2 installed it connects via DSN; tests (and
this environment, which ships no psql driver) inject any DB-API
``conn_factory`` + its paramstyle — the identical SQL executes against
sqlite3, so the handler logic is exercised rather than import-gated.
"""

import json
import time
from typing import Any, Callable, Dict, List, Optional

from marie_tpu.logging_core import MarieLogger

_DDL = (
    "CREATE TABLE IF NOT EXISTS message_events ("
    "id {serial}, ts {float} NOT NULL, event TEXT NOT NULL, "
    "job_id TEXT, payload TEXT)"
)


class PsqlToastHandler:
    def __init__(
        self,
        dsn: str = "",
        conn_factory: Optional[Callable[[], Any]] = None,
        paramstyle: str = "%s",
        dialect: str = "postgres",
    ):
        self.logger = MarieLogger("PsqlToast")
        self._p = paramstyle
        if conn_factory is None:
            conn_factory = self._psycopg2_factory(dsn)
        self._conn = conn_factory()
        serial = "SERIAL PRIMARY KEY" if dialect == "postgres" else (
            "INTEGER PRIMARY KEY AUTOINCREMENT"
        )
        floatty = "DOUBLE PRECISION" if dialect == "postgres" else "REAL"
        cur = self._conn.cursor()
        cur.execute(_DDL.format(serial=serial, float=floatty))
        self._conn.commit()

    @staticmethod
    def _psycopg2_factory(dsn: str) -> Callable[[], Any]:
        def factory():
            try:
                import psycopg2
            except ImportError as ex:
                raise RuntimeError(
                    "PsqlToastHandler needs psycopg2 (or an injected "
                    "conn_factory)"
                ) from ex

            return psycopg2.connect(dsn)

        return factory

    def notify(self, event: str, notification: Dict[str, Any], **kwargs) -> None:
        cur = self._conn.cursor()
        cur.execute(
            f"INSERT INTO message_events (ts, event, job_id, payload) "
            f"VALUES ({self._p},{self._p},{self._p},{self._p})",
            (
                time.time(),
                event,
                notification.get("job_id", ""),
                json.dumps(notification),
            ),
        )
        self._conn.commit()

    def events_for(self, job_id: str) -> List[Dict[str, Any]]:
        cur = self._conn.cursor()
        cur.execute(
            f"SELECT event, payload FROM message_events WHERE job_id={self._p} "
            f"ORDER BY id",
            (job_id,),
        )
        return [{"event": e, **json.loads(p)} for e, p in cur.fetchall()]

    def close(self) -> None:
        try:
            self._conn.close()
        except Exception:  # noqa: BLE001
            pass
