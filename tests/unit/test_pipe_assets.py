"""Pipeline asset lifecycle: burst/store/restore + stage-skip resume
(reference ``/root/reference/marie/pipe/components.py:48,450,502,535``
and ``extract_pipeline.py:163-173,325,385``)."""

import json
import os

import numpy as np
import pytest

from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine
from marie_tpu.pipe import ClassificationPipeline, ExtractPipeline
from marie_tpu.pipe.assets import (
    burst_frames,
    get_file_count,
    restore_assets,
    s3_asset_path,
    split_filename,
    store_assets,
)
from marie_tpu.storage.manager import PathHandler, StorageManager


class MemoryS3Handler(PathHandler):
    """In-memory s3:// handler (test double for the SigV4 client)."""

    def __init__(self, reachable=True):
        self.blobs = {}
        self.reachable = reachable

    def get_supported_prefixes(self):
        return ["s3://"]

    def ping(self):
        return self.reachable

    def exists(self, path):
        return path in self.blobs or any(
            k.startswith(path.rstrip("/") + "/") for k in self.blobs
        )

    def read_bytes(self, path):
        return self.blobs[path]

    def write_bytes(self, path, data):
        self.blobs[path] = data

    def list(self, path):
        base = path.rstrip("/")
        return sorted(
            k for k in self.blobs if k == base or k.startswith(base + "/")
        )


@pytest.fixture
def mem_s3():
    saved = dict(StorageManager._handlers)
    handler = MemoryS3Handler()
    StorageManager.register_handler(handler)
    yield handler
    StorageManager._handlers = saved


@pytest.fixture
def no_s3():
    saved = dict(StorageManager._handlers)
    StorageManager._handlers = {
        k: v for k, v in saved.items() if not k.startswith("s3")
    }
    yield
    StorageManager._handlers = saved


def _frames(n=2, h=64, w=96):
    rng = np.random.default_rng(7)
    return [
        rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8).astype(np.uint8)
        for _ in range(n)
    ]


# --- naming ----------------------------------------------------------------

def test_split_filename():
    assert split_filename("a/b/sample.tif") == ("sample.tif", "sample", "tif")
    assert split_filename("noext") == ("noext", "noext", "")
    assert split_filename("two.dots.png") == ("two.dots.png", "two.dots", "png")


def test_s3_asset_path_shapes(monkeypatch):
    monkeypatch.delenv("MARIE_S3_BUCKET", raising=False)
    assert s3_asset_path("sample.tif", "ocr") == "s3://marie/ocr/sample"
    assert s3_asset_path("SAMple.tif", "OCR") == "s3://marie/ocr/sample"
    assert (
        s3_asset_path("SAMple.tif", "ocr", include_prefix=True)
        == "s3://marie/ocr/sample/SAMple"
    )
    assert (
        s3_asset_path("SAMple.tif", "ocr", include_filename=True)
        == "s3://marie/ocr/sample/SAMple.tif"
    )
    # path traversal is neutralised
    assert ".." not in s3_asset_path("../../etc/passwd.tif", "a/../b")
    monkeypatch.setenv("MARIE_S3_BUCKET", "custom")
    assert s3_asset_path("x.tif", "t").startswith("s3://custom/")


# --- StorageManager dir copies ----------------------------------------------

def test_copy_dir_and_copy_remote_roundtrip(tmp_path, mem_s3):
    src = tmp_path / "src"
    (src / "clean").mkdir(parents=True)
    (src / "results").mkdir()
    (src / "clean" / "p0.png").write_bytes(b"png0")
    (src / "results" / "ocr.json").write_bytes(b"{}")
    (src / "top.txt").write_bytes(b"t")

    stored = StorageManager.copy_dir(str(src), "s3://marie/t/doc")
    assert sorted(os.path.basename(p) for p in stored) == [
        "ocr.json", "p0.png", "top.txt",
    ]
    assert mem_s3.blobs["s3://marie/t/doc/clean/p0.png"] == b"png0"

    dst = tmp_path / "dst"
    restored = StorageManager.copy_remote("s3://marie/t/doc", str(dst))
    assert (dst / "clean" / "p0.png").read_bytes() == b"png0"
    assert len(restored) == 3

    # wildcard narrows the restore to one subtree
    dst2 = tmp_path / "dst2"
    restored = StorageManager.copy_remote(
        "s3://marie/t/doc", str(dst2), match_wildcard="clean/*"
    )
    assert [os.path.basename(p) for p in restored] == ["p0.png"]
    assert not (dst2 / "results").exists()

    # overwrite=False keeps existing local bytes
    (dst / "clean" / "p0.png").write_bytes(b"local-edit")
    StorageManager.copy_remote("s3://marie/t/doc", str(dst), overwrite=False)
    assert (dst / "clean" / "p0.png").read_bytes() == b"local-edit"
    StorageManager.copy_remote("s3://marie/t/doc", str(dst), overwrite=True)
    assert (dst / "clean" / "p0.png").read_bytes() == b"png0"


def test_copy_dir_wildcard(tmp_path, mem_s3):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_bytes(b"{}")
    (src / "b.tif").write_bytes(b"x")
    stored = StorageManager.copy_dir(
        str(src), "s3://marie/t/doc", match_wildcard="*.json"
    )
    assert [os.path.basename(p) for p in stored] == ["a.json"]


def test_ensure_connection(no_s3):
    assert StorageManager.ensure_connection("s3://", silence_exceptions=True) is False


def test_ensure_connection_unreachable(tmp_path):
    saved = dict(StorageManager._handlers)
    try:
        StorageManager.register_handler(MemoryS3Handler(reachable=False))
        assert StorageManager.ensure_connection("s3://", silence_exceptions=True) is False
        with pytest.raises(Exception):
            StorageManager.ensure_connection("s3://", silence_exceptions=False)
    finally:
        StorageManager._handlers = saved


# --- burst ------------------------------------------------------------------

def test_burst_frames_idempotent(tmp_path):
    frames = _frames(3)
    out = burst_frames("doc.tif", frames, str(tmp_path))
    names = sorted(os.listdir(out))
    assert names == ["doc_00000.tif", "doc_00001.tif", "doc_00002.tif"]
    first_mtimes = [os.path.getmtime(os.path.join(out, n)) for n in names]
    burst_frames("doc.tif", frames, str(tmp_path))  # count match -> no-op
    assert [os.path.getmtime(os.path.join(out, n)) for n in names] == first_mtimes
    burst_frames("doc.tif", frames, str(tmp_path), force=True)
    assert get_file_count(out) == 3


# --- store/restore ----------------------------------------------------------

def test_store_and_restore_assets(tmp_path, mem_s3):
    local = tmp_path / "run1"
    (local / "clean").mkdir(parents=True)
    (local / "clean" / "c0.png").write_bytes(b"c0")
    (local / "burst").mkdir()
    (local / "burst" / "b0.tif").write_bytes(b"b0")
    stored = store_assets("doc.tif", "ocr", str(local))
    assert len(stored) == 2

    # partial restore pulls clean/results/pdf but NOT burst
    fresh = tmp_path / "run2"
    fresh.mkdir()
    base = restore_assets("doc.tif", "ocr", str(fresh))
    assert base == "s3://marie/ocr/doc"
    assert (fresh / "clean" / "c0.png").read_bytes() == b"c0"
    assert not (fresh / "burst").exists()

    full = tmp_path / "run3"
    full.mkdir()
    restore_assets("doc.tif", "ocr", str(full), full_restore=True)
    assert (full / "burst" / "b0.tif").read_bytes() == b"b0"


def test_store_restore_without_storage(tmp_path, no_s3):
    # best-effort: no s3 handler registered -> no raise, empty results
    assert store_assets("d.tif", "t", str(tmp_path)) == []
    assert restore_assets("d.tif", "t", str(tmp_path)) is None


# --- pipeline resume --------------------------------------------------------

class CountingOverlay:
    def __init__(self):
        self.calls = 0

    def segment_batch(self, frames):
        self.calls += 1
        # deterministic visible change: darken every page
        return [np.clip(f.astype(np.int16) - 17, 0, 255).astype(np.uint8)
                for f in frames]


def test_extract_pipeline_segment_resume(tmp_path, no_s3):
    overlay = CountingOverlay()
    pipe = ExtractPipeline(
        ocr_engine=MockOcrEngine(), overlay_processor=overlay,
        work_dir=str(tmp_path), renderers=("text",),
    )
    frames = _frames(2, 128, 128)
    meta1 = pipe.execute("doc.tif", "ocr", frames)
    assert overlay.calls == 1
    # burst + clean assets landed in the checksum dir
    run_dirs = os.listdir(tmp_path)
    assert len(run_dirs) == 1
    root = os.path.join(tmp_path, run_dirs[0])
    assert get_file_count(os.path.join(root, "burst")) == 2
    assert get_file_count(os.path.join(root, "clean")) == 2

    # same document again: segmentation is skipped, results unchanged
    meta2 = pipe.execute("doc.tif", "ocr", frames)
    assert overlay.calls == 1
    assert meta2["pages"] == meta1["pages"]
    assert [r.get("words") for r in meta2["ocr"]] == [
        r.get("words") for r in meta1["ocr"]
    ]


def test_extract_pipeline_restore_skips_segment_on_fresh_host(tmp_path, mem_s3):
    """Assets mirrored to storage let a DIFFERENT work dir (new host)
    skip the overlay stage entirely."""
    frames = _frames(2, 128, 128)
    o1 = CountingOverlay()
    pipe1 = ExtractPipeline(
        ocr_engine=MockOcrEngine(), overlay_processor=o1,
        work_dir=str(tmp_path / "hostA"), renderers=("text",),
    )
    pipe1.execute("doc.tif", "ocr", frames)
    assert o1.calls == 1
    assert any("/clean/" in k for k in mem_s3.blobs)

    o2 = CountingOverlay()
    pipe2 = ExtractPipeline(
        ocr_engine=MockOcrEngine(), overlay_processor=o2,
        work_dir=str(tmp_path / "hostB"), renderers=("text",),
    )
    pipe2.execute("doc.tif", "ocr", frames)
    assert o2.calls == 0  # restored clean pages from storage


class CountingOcr(MockOcrEngine):
    def __init__(self):
        super().__init__()
        self.calls = 0

    def extract(self, *a, **kw):
        self.calls += 1
        return super().extract(*a, **kw)


def test_classification_pipeline_ocr_cache(tmp_path, no_s3):
    ocr = CountingOcr()
    pipe = ClassificationPipeline(ocr_engine=ocr, work_dir=str(tmp_path))
    frames = _frames(2, 128, 128)
    meta1 = pipe.execute("doc.tif", "ocr", frames)
    assert ocr.calls == 1
    meta2 = pipe.execute("doc.tif", "ocr", frames)
    assert ocr.calls == 1  # cache hit — OCR not re-run
    assert meta2["pages"] == meta1["pages"]
    # the cache file is real JSON on disk
    runs = os.listdir(tmp_path)
    cache = os.path.join(tmp_path, runs[0], "results", "ocr.json")
    with open(cache) as fp:
        assert isinstance(json.load(fp), list)


def test_pack_assets_delivery_layout(tmp_path, no_s3):
    """The assets/ delivery dir matches the reference layout
    (pack_assets, extract_pipeline.py:579): adlib+blobs zips, merged
    clean TIFF (+ .tif copy), PDF copy."""
    import zipfile

    overlay = CountingOverlay()
    pipe = ExtractPipeline(
        ocr_engine=MockOcrEngine(), overlay_processor=overlay,
        work_dir=str(tmp_path), renderers=("text", "pdf", "blobs", "adlib"),
    )
    frames = _frames(2, 128, 128)
    meta = pipe.execute("claim.tif", "ocr", frames)
    root = os.path.join(tmp_path, os.listdir(tmp_path)[0])
    assets = os.path.join(root, "assets")
    names = sorted(os.listdir(assets))
    assert names == [
        "claim.blobs.xml.zip", "claim.ocr.zip", "claim.pdf",
        "claim.tif", "claim.tif.clean",
    ], names
    # the clean TIFF really holds one page per frame
    from PIL import Image

    img = Image.open(os.path.join(assets, "claim.tif.clean"))
    assert getattr(img, "n_frames", 1) == 2
    # zips are valid archives with entries
    with zipfile.ZipFile(os.path.join(assets, "claim.blobs.xml.zip")) as zf:
        assert len(zf.namelist()) >= 1
    assert any("assets" in a for a in meta["assets"])
