"""In-process fake PostgreSQL DB-API connection (sqlite-backed).

Exercises the scheduler's ``dialect="postgresql"`` code path — %s
placeholder rewriting, cursor() plumbing, RETURNING, mapping rows —
without a server.  What it canNOT fake is the lock manager:
``FOR UPDATE SKIP LOCKED`` is stripped (sqlite takes a whole-database
write lock instead), so multi-connection SKIP LOCKED semantics are only
covered by the real-server tests (MARIE_TEST_PG).
"""

import re
import sqlite3
import threading

_SKIP_LOCKED = re.compile(r"\s+FOR\s+UPDATE\s+SKIP\s+LOCKED", re.I)


class FakeCursor:
    def __init__(self, conn: sqlite3.Connection):
        self._conn = conn
        self._cur = None

    def execute(self, sql: str, params=()):
        sql = sql.replace("%s", "?")
        sql = _SKIP_LOCKED.sub("", sql)
        self._cur = self._conn.execute(sql, params)
        return self

    def fetchone(self):
        row = self._cur.fetchone()
        return dict(row) if row is not None else None

    def fetchall(self):
        return [dict(r) for r in self._cur.fetchall()]

    @property
    def rowcount(self):
        return self._cur.rowcount

    def close(self):
        pass


class FakePGConnection:
    """DB-API-ish connection: cursor() yields dict rows (RealDictCursor
    shape), `with conn:` commits like psycopg2."""

    _lock = threading.Lock()

    def __init__(self, path: str):
        self._conn = sqlite3.connect(path, timeout=30)
        self._conn.row_factory = sqlite3.Row

    def cursor(self):
        return FakeCursor(self._conn)

    def commit(self):
        self._conn.commit()

    def rollback(self):
        self._conn.rollback()

    def close(self):
        self._conn.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is None:
            self._conn.commit()
        else:
            self._conn.rollback()
        return False
