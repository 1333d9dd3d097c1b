import pytest

from marie_tpu.messaging import Toast
from marie_tpu.messaging.native_handler import NativeToastHandler
from marie_tpu.messaging.publisher import mark_as_complete, mark_as_started
from marie_tpu.messaging.sqlite_handler import SqliteToastHandler
from marie_tpu.storage.kv.in_memory import InMemoryKV
from marie_tpu.storage.kv.sqlite_kv import SqliteKV


@pytest.mark.parametrize("kv_cls", [InMemoryKV, SqliteKV])
async def test_kv_roundtrip(kv_cls, tmp_path):
    kv = kv_cls() if kv_cls is InMemoryKV else SqliteKV(str(tmp_path / "kv.db"))
    assert await kv.internal_kv_put(b"k1", b"v1", True, b"ns") == 1
    assert await kv.internal_kv_get(b"k1", b"ns") == b"v1"
    assert await kv.internal_kv_get(b"k1", b"other") is None
    assert await kv.internal_kv_exists(b"k1", b"ns")
    # no-overwrite
    assert await kv.internal_kv_put(b"k1", b"v2", False, b"ns") == 0
    assert await kv.internal_kv_get(b"k1", b"ns") == b"v1"
    # prefix scan
    await kv.internal_kv_put(b"k2", b"x", True, b"ns")
    await kv.internal_kv_put(b"zzz", b"x", True, b"ns")
    keys = await kv.internal_kv_keys(b"k", b"ns")
    assert sorted(keys) == [b"k1", b"k2"]
    # delete
    assert await kv.internal_kv_del(b"k1", b"ns") == 1
    assert not await kv.internal_kv_exists(b"k1", b"ns")


async def test_toast_fanout_and_events(tmp_path):
    Toast.unregister_all()
    jsonl = NativeToastHandler(str(tmp_path / "events.jsonl"))
    sql = SqliteToastHandler(str(tmp_path / "events.db"))
    Toast.register(jsonl, native=True)
    Toast.register(sql, event="job")

    await mark_as_started("job-1")
    await mark_as_complete("job-1")

    import json

    lines = [
        json.loads(l)
        for l in open(tmp_path / "events.jsonl").read().splitlines()
    ]
    assert [l["event"] for l in lines] == ["job.started", "job.completed"]

    evs = sql.events_for("job-1")
    assert len(evs) == 2
    Toast.unregister_all()


async def test_toast_handler_errors_do_not_break_flow(tmp_path):
    Toast.unregister_all()

    class Broken:
        def notify(self, event, notification, **kw):
            raise RuntimeError("handler down")

    seen = []

    class Good:
        def notify(self, event, notification, **kw):
            seen.append(event)

    Toast.register(Broken())
    Toast.register(Good())
    await Toast.notify("x.y", {"job_id": "j"})
    assert seen == ["x.y"]
    Toast.unregister_all()


def test_storage_manager_native(tmp_path):
    from marie_tpu.storage import StorageManager

    p = str(tmp_path / "a" / "b.bin")
    StorageManager.write(p, b"\x01\x02")
    assert StorageManager.exists(p)
    assert StorageManager.read(p) == b"\x01\x02"
    assert p in StorageManager.list(str(tmp_path))
    StorageManager.copy(p, str(tmp_path / "c.bin"))
    assert StorageManager.read(str(tmp_path / "c.bin")) == b"\x01\x02"


def test_s3_handler_unreachable_endpoint_is_storage_error():
    """The native S3 client surfaces connection failures as StorageError
    (full wire-path coverage lives in tests/integration/test_remote_fakes.py)."""
    from marie_tpu.excepts import StorageError
    from marie_tpu.storage.s3_storage import S3StorageHandler

    h = S3StorageHandler(
        endpoint_url="http://127.0.0.1:1", access_key="k", secret_key="s",
        timeout=1.0,
    )
    with pytest.raises(StorageError, match="unreachable"):
        h.read_bytes("s3://bucket/key")
    with pytest.raises(StorageError, match="unreachable"):
        h.exists("s3://bucket/key")
