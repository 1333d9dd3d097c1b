"""Single-program fused OCR path (``marie_tpu/ocr/fused.py``) — exact
parity with the two-phase engine across batching, padding, and fallback
edge cases.

The fused path re-implements the detect→filter→crop→decode seam inside
one XLA program; its row-alignment contract (device keep order ==
host ``detect_collect(return_rows=True)`` order) is what these tests
pin down.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
from marie_tpu.models.configs import CraftConfig, TrOCRConfig
from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
from marie_tpu.preprocess import BucketSpec


def _page(seed: int, h: int = 256, w: int = 384, n_words: int = 3) -> np.ndarray:
    page = np.full((h, w, 3), 255, np.uint8)
    rng = np.random.default_rng(seed)
    for i in range(n_words):
        cv2.putText(
            page,
            f"W{seed}{i}",
            (int(rng.integers(20, w - 130)), int(rng.integers(40, h - 30))),
            cv2.FONT_HERSHEY_SIMPLEX,
            0.6,
            (0, 0, 0),
            2,
        )
    return page


@pytest.fixture(scope="module")
def processors():
    bp = BoxProcessorCraft(
        config=CraftConfig.tiny(),
        box_source="ink",
        max_components=64,
        bucket_spec=BucketSpec(shapes=((256, 384), (512, 384))),
    )
    op = TrOcrProcessor(config=TrOCRConfig.tiny(), batch_sizes=(8, 32))
    return bp, op


def _words(results):
    return [
        ([w["text"] for w in r["words"]], [w["box"] for w in r["words"]])
        for r in results
    ]


def test_single_program_matches_two_phase(processors):
    bp, op = processors
    pages = [_page(s) for s in range(3)]
    fused = PipelineOcrEngine(bp, op, single_program=True, page_fuse_batch=1)
    two_phase = PipelineOcrEngine(bp, op, single_program=False)
    assert _words(fused.extract(pages)) == _words(two_phase.extract(pages))


def test_page_batched_with_ladder_padding(processors):
    bp, op = processors
    # 5 same-bucket pages with page_fuse_batch=4 -> one full group of 4
    # plus a remainder; 3 pages -> padded up the ladder to a 4-wide program
    fused = PipelineOcrEngine(bp, op, page_fuse_batch=4)
    two_phase = PipelineOcrEngine(bp, op, single_program=False)
    for n in (5, 3, 1):
        pages = [_page(s) for s in range(n)]
        got = fused.extract(pages)
        assert len(got) == n
        assert _words(got) == _words(two_phase.extract(pages))


def test_mixed_buckets_split_groups(processors):
    bp, op = processors
    pages = [_page(0, 250), _page(1, 250), _page(2, 500), _page(3, 250)]
    fused = PipelineOcrEngine(bp, op, page_fuse_batch=4)
    two_phase = PipelineOcrEngine(bp, op, single_program=False)
    assert _words(fused.extract(pages)) == _words(two_phase.extract(pages))


def test_rec_slots_overflow_falls_back(processors):
    bp, op = processors
    pages = [_page(s, n_words=4) for s in range(2)]
    # single-page fused program: per-page rec_slots budget overflows
    fused1 = PipelineOcrEngine(bp, op, page_fuse_batch=1, rec_slots=2)
    # page-batched compact program: GLOBAL budget (2 pages * 2 slots)
    # overflows and the tail recognises through the fallback dispatch
    fusedg = PipelineOcrEngine(bp, op, page_fuse_batch=2, compact_slots=2)
    two_phase = PipelineOcrEngine(bp, op, single_program=False)
    want = _words(two_phase.extract(pages))
    assert _words(fused1.extract(pages)) == want
    assert _words(fusedg.extract(pages)) == want


def test_compact_budget_borrowing(processors):
    """A dense page may borrow compacted slots a sparse page leaves
    unused — total kept fits the global budget, nothing overflows."""
    bp, op = processors
    dense, sparse = _page(1, n_words=5), _page(2, n_words=1)
    fused = PipelineOcrEngine(bp, op, page_fuse_batch=2, compact_slots=4)
    two_phase = PipelineOcrEngine(bp, op, single_program=False)
    for pages in ([dense, sparse], [sparse, dense]):
        assert _words(fused.extract(pages)) == _words(two_phase.extract(pages))


def test_grayscale_2d_frames_match_rgb(processors):
    """2-D grayscale frames flow through the fused path without channel
    expansion on host and decode identically to their RGB triplicates."""
    bp, op = processors
    rgb_pages = [_page(s) for s in range(3)]
    gray_pages = [p[..., 0].copy() for p in rgb_pages]  # channels equal
    fused = PipelineOcrEngine(bp, op, page_fuse_batch=2)
    assert _words(fused.extract(gray_pages)) == _words(fused.extract(rgb_pages))


def test_detector_accepts_2d_page(processors):
    """detect_words (the two-phase dispatch path) must accept a 2-D
    grayscale page directly — channels expand on device."""
    bp, _ = processors
    rgb = _page(4)
    b_rgb, _ = bp.detect_words(rgb)
    b_gray, _ = bp.detect_words(rgb[..., 0].copy())
    assert np.array_equal(b_rgb, b_gray)


def test_blank_page_in_group(processors):
    bp, op = processors
    blank = np.full((256, 384, 3), 255, np.uint8)
    fused = PipelineOcrEngine(bp, op, page_fuse_batch=2)
    out = fused.extract([blank, _page(9)])
    assert out[0]["words"] == []
    assert len(out[1]["words"]) > 0


def test_dispatch_stream_order_and_bounding(processors):
    """fused_dispatch_stream yields group handles in page order and
    respects the max_in_flight bound (worker blocks, consumer drains)."""
    from marie_tpu.ocr.fused import fused_dispatch_stream, handle_page_count

    bp, op = processors
    pages = [_page(s) for s in range(5)]
    handles = list(fused_dispatch_stream(
        bp, op, pages, page_batch=2, compact_slots=8, max_in_flight=1,
    ))
    # 5 pages at page_batch=2 -> groups of 2, 2, 1
    assert [handle_page_count(h) for h in handles] == [2, 2, 1]


def test_dispatch_stream_propagates_worker_errors(processors, monkeypatch):
    """An exception on the upload/dispatch worker thread surfaces to the
    consuming thread instead of hanging the stream."""
    import marie_tpu.ocr.fused as fused_mod

    bp, op = processors

    def boom(*a, **k):
        raise RuntimeError("upload failed")

    monkeypatch.setattr(fused_mod, "_upload_group", boom)
    pages = [_page(s) for s in range(2)]
    with pytest.raises(RuntimeError, match="upload failed"):
        list(fused_mod.fused_dispatch_stream(bp, op, pages, page_batch=2))
