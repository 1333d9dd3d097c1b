"""Executor-side result persistence (StorageMixin + PostgreSQLStorage).

Reference semantics under test:
``/root/reference/marie/executor/mixin.py`` (setup_storage/store) and
``/root/reference/marie/executor/storage/PostgreSQLStorage/postgreshandler.py``
(upsert by doc_id, sha256 virtual shards, store modes, soft delete,
snapshot + shard-ranged reads).  Runs against real sqlite3 through the
injected-DBAPI surface.
"""

import sqlite3

import numpy as np
import pytest

from marie_tpu.api.docs import StorageDoc
from marie_tpu.excepts import BadConfigSource
from marie_tpu.executor.storage import PostgreSQLStorage, StorageMixin


def _store(tmp_path, **kw):
    db = str(tmp_path / "store.db")
    return PostgreSQLStorage(
        lambda: sqlite3.connect(db), paramstyle="?", dialect="sqlite", **kw
    )


def test_add_get_roundtrip_content_mode(tmp_path):
    st = _store(tmp_path)
    docs = [
        StorageDoc(id="d1", content={"words": ["a", "b"]},
                   tags={"index": 0, "type": "extract"}),
        StorageDoc(id="d2", content={"words": ["c"]}, tags={"index": 1}),
    ]
    assert st.add(docs, store_mode="content", ref_id="r-1",
                  ref_type="extract") == 2
    row = st.get("d1")
    assert row["content"] == {"words": ["a", "b"]}
    assert row["tags"]["type"] == "extract"
    assert row["ref_id"] == "r-1" and row["ref_type"] == "extract"
    assert st.size == 2


def test_upsert_replaces_by_doc_id(tmp_path):
    st = _store(tmp_path)
    st.add([StorageDoc(id="d1", content="v1")], "content", ref_id="a")
    st.add([StorageDoc(id="d1", content="v2")], "content", ref_id="b")
    assert st.size == 1
    row = st.get("d1")
    assert row["content"] == "v2" and row["ref_id"] == "b"


def test_store_modes_and_invalid_mode(tmp_path):
    st = _store(tmp_path)
    st.add([StorageDoc(id="b1", blob=b"\x00\x01")], "blob")
    st.add([StorageDoc(id="e1", embedding=np.array([1.0, 0.0]))], "embedding")
    st.add([StorageDoc(id="j1", content={"k": 1}, tags={"t": 2})], "doc")
    assert st.get("b1")["blob"] == b"\x00\x01"
    assert st.get("e1")["embedding"] == [1.0, 0.0]
    assert st.get("j1")["doc"]["tags"] == {"t": 2}
    with pytest.raises(ValueError):
        st.add([StorageDoc(id="x")], "bogus")


def test_soft_delete_hides_then_hard_delete(tmp_path):
    st = _store(tmp_path)
    st.add([StorageDoc(id="d1", content="x")], "content")
    st.delete("d1")  # soft
    assert st.get("d1") is None and st.size == 0
    # re-add revives the row (upsert clears is_deleted)
    st.add([StorageDoc(id="d1", content="y")], "content")
    assert st.get("d1")["content"] == "y"
    st.delete("d1", soft=False)
    assert st.size == 0


def test_virtual_shard_assignment_is_stable_sha256(tmp_path):
    import hashlib

    st = _store(tmp_path, virtual_shards=128)
    expect = int(hashlib.sha256(b"doc-42").hexdigest(), 16) % 128
    assert st._get_next_shard("doc-42") == expect


def test_snapshot_and_shard_ranged_read(tmp_path):
    st = _store(tmp_path, virtual_shards=4)
    docs = [StorageDoc(id=f"d{i}", content=i) for i in range(20)]
    st.add(docs, "content", ref_id="r")
    assert st.snapshot() == 20
    # post-snapshot writes don't appear in the snapshot
    st.add([StorageDoc(id="late", content="z")], "content")
    assert st.snapshot_size == 20
    got = []
    for shard in range(4):
        got.extend(st.get_snapshot([shard]))
    assert len(got) == 20


def test_similarity_search_portable_path(tmp_path):
    st = _store(tmp_path)
    st.add(
        [StorageDoc(id=n, embedding=np.array(v)) for n, v in
         [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.9, 0.1])]],
        "embedding",
    )
    hits = st.similarity_search([1.0, 0.0], k=2)
    assert hits == ["a", "c"]
    scored = st.similarity_search_with_score([1.0, 0.0], k=1)
    assert scored[0][0] == "a" and scored[0][1] == pytest.approx(0.0)


def test_list_by_ref(tmp_path):
    st = _store(tmp_path)
    st.add([StorageDoc(id="p0", content=0), StorageDoc(id="p1", content=1)],
           "content", ref_id="bundle-7", ref_type="extract")
    st.add([StorageDoc(id="q0", content=9)], "content", ref_id="other")
    rows = st.list_by_ref("bundle-7")
    assert [r["doc_id"] for r in rows] == ["p0", "p1"]


# -- StorageMixin --------------------------------------------------------


class _Exec(StorageMixin):
    pass


def test_mixin_disabled_is_noop():
    ex = _Exec()
    ex.setup_storage(False, None)
    assert ex.store("r", "t", "content", [StorageDoc(id="d")]) == 0


def test_mixin_sqlite_conf_and_store(tmp_path):
    ex = _Exec()
    ex.setup_storage(True, {"provider": "sqlite",
                            "path": str(tmp_path / "m.db"),
                            "default_table": "results"})
    n = ex.store("ref-1", "extract", "content",
                 [StorageDoc(id="d1", content={"ok": True})])
    assert n == 1
    assert ex.storage.get("d1")["ref_type"] == "extract"


def test_mixin_bad_conf_raises_or_silences(tmp_path):
    ex = _Exec()
    with pytest.raises(BadConfigSource):
        # reference psycopg2 shape without required keys
        ex.setup_storage(True, {"hostname": "nowhere"})
    ex2 = _Exec()
    ex2.setup_storage(True, {"hostname": "nowhere"}, silence_exceptions=True)
    assert ex2.storage_enabled is False
    assert ex2.store("r", "t", "content", [StorageDoc(id="d")]) == 0


def test_mixin_store_never_raises_into_serving(tmp_path):
    ex = _Exec()
    ex.setup_storage(True, {"provider": "sqlite",
                            "path": str(tmp_path / "m.db")})
    ex.storage.close()  # break the backend
    assert ex.store("r", "t", "content", [StorageDoc(id="d")]) == 0


def test_text_executor_persists_extract_results(tmp_path):
    """End-to-end: mock-engine pipeline + storage_enabled persists one
    content-mode StorageDoc per request keyed by ref_id."""
    from marie_tpu.executor.text_extraction_executor import (
        TextExtractionExecutor,
    )
    from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine
    from marie_tpu.pipe.extract_pipeline import ExtractPipeline
    from marie_tpu.types.docs import Document, DocumentArray

    pipeline = ExtractPipeline(
        ocr_engine=MockOcrEngine(), work_dir=str(tmp_path / "work")
    )
    ex = TextExtractionExecutor(
        pipeline=pipeline,
        storage_enabled=True,
        storage_conf={"provider": "sqlite",
                      "path": str(tmp_path / "exec.db"),
                      "default_table": "extract_results"},
    )
    page = np.full((64, 64, 3), 255, np.uint8)
    docs = DocumentArray([Document(tensor=page)])
    out = ex.extract(docs, parameters={"ref_id": "job-9", "ref_type": "doc"})
    assert out["status"] == "succeeded"
    rows = ex.storage.list_by_ref("job-9")
    assert len(rows) == 1
    assert rows[0]["tags"]["type"] == "extract_results"
    assert rows[0]["store_mode"] == "content"
