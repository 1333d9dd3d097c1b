import numpy as np
import pytest

from marie_tpu.boxes.ink_box_processor import InkBoxProcessor
from marie_tpu.boxes.line_processor import assign_line_numbers, find_line_number, line_merge
from marie_tpu.enums import CoordinateFormat, PSMode
from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine
from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
from marie_tpu.utils.overlap import find_overlap_vertical, merge_bboxes_as_block
from tests.helpers import synth_page


def iou_xywh(a, b):
    ax0, ay0, aw, ah = a
    bx0, by0, bw, bh = b
    ix = max(0, min(ax0 + aw, bx0 + bw) - max(ax0, bx0))
    iy = max(0, min(ay0 + ah, by0 + bh) - max(ay0, by0))
    inter = ix * iy
    return inter / (aw * ah + bw * bh - inter)


@pytest.fixture(scope="module")
def ink_proc():
    return InkBoxProcessor()


def test_line_merge_groups_rows():
    boxes = [
        [10, 10, 50, 12],
        [70, 11, 40, 12],
        [10, 40, 60, 12],
        [80, 42, 30, 10],
    ]
    lines = line_merge(np.zeros((100, 200, 3), np.uint8), boxes)
    assert len(lines) == 2
    assert lines[0][1] <= lines[1][1]


def test_find_line_number():
    lines = [[0, 10, 100, 12], [0, 40, 100, 12]]
    assert find_line_number(lines, [20, 41, 10, 10]) == 2
    assert find_line_number(lines, [20, 9, 10, 12]) == 1
    # degenerate box overlapping nothing -> nearest line
    assert find_line_number(lines, [20, 60, 10, 2]) == 2


def test_assign_line_numbers_vectorised():
    lines = [[0, 10, 100, 12], [0, 40, 100, 12]]
    boxes = [[5, 11, 10, 10], [5, 42, 10, 8], [5, 70, 10, 2]]
    out = assign_line_numbers(lines, boxes)
    assert out.tolist() == [1, 2, 2]


def test_overlap_helpers():
    assert merge_bboxes_as_block([[0, 0, 10, 10], [20, 5, 10, 10]]) == [0, 0, 30, 15]
    _, idx, scores = find_overlap_vertical([0, 0, 10, 10], [[5, 5, 10, 10], [0, 50, 5, 5]])
    assert idx == [0]
    assert scores[0] == pytest.approx(5 / 15)


def test_ink_detector_finds_word_blocks(ink_proc):
    words = [("hello", 50, 100), ("world", 150, 100), ("foo", 50, 200)]
    page, want_boxes = synth_page(words)
    got, scores = ink_proc.detect_words(page)
    assert len(got) == 3
    # each wanted box matched by a detection with IoU > 0.8
    for wb in want_boxes:
        best = max(iou_xywh(wb, gb) for gb in got.tolist())
        assert best > 0.8, (wb, got)


def test_extract_bounding_boxes_reading_order(ink_proc):
    words = [("bb", 200, 100), ("aa", 50, 100), ("cc", 50, 200)]
    page, _ = synth_page(words)
    boxes, frags, lines, meta, line_bboxes = ink_proc.extract_bounding_boxes(
        "q", "c", page, PSMode.SPARSE
    )
    assert len(boxes) == 3
    assert lines.tolist() == [1, 1, 2]
    # reading order: aa (x=50,line1), bb (x=200,line1), cc (line2)
    assert boxes[0][0] < boxes[1][0]
    assert len(line_bboxes) == 2
    assert all(f.size > 0 for f in frags)


def test_psmode_word_raw_line(ink_proc):
    page, _ = synth_page([("x", 10, 10)], size=(64, 128))
    boxes, frags, lines, _, _ = ink_proc.extract_bounding_boxes(
        "q", "c", page, PSMode.WORD
    )
    assert len(boxes) == 1
    assert boxes[0].tolist() == [0, 0, 128, 64]

    boxes, _, lines, _, _ = ink_proc.extract_bounding_boxes(
        "q", "c", page, PSMode.RAW_LINE
    )
    assert len(boxes) == 1
    assert lines.tolist() == [1]


def test_psmode_multiline(ink_proc):
    page, _ = synth_page([("aaa", 50, 50), ("bbb", 50, 150)], size=(256, 256))
    boxes, _, lines, _, _ = ink_proc.extract_bounding_boxes(
        "q", "c", page, PSMode.MULTI_LINE
    )
    assert len(boxes) == 2
    assert lines.tolist() == [1, 2]


def test_mock_engine_schema():
    eng = MockOcrEngine()
    page = np.full((200, 300, 3), 255, np.uint8)
    results = eng.extract([page, page])
    assert len(results) == 2
    r = results[0]
    assert set(r) == {"meta", "words", "lines"}
    assert r["meta"]["page"] == 0
    assert results[1]["meta"]["page"] == 1
    assert r["meta"]["imageSize"] == {"width": 300, "height": 200}
    wd = r["words"][0]
    assert {"id", "text", "confidence", "box", "line", "word_index"} <= set(wd)


def test_pipeline_engine_with_mock_recognizer(ink_proc):
    from marie_tpu.document.ocr_processor import OcrProcessor

    class EchoProcessor(OcrProcessor):
        def recognize_from_fragments(self, fragments):
            return [
                {"text": f"w{i}", "confidence": 0.9} for i in range(len(fragments))
            ]

    eng = PipelineOcrEngine(ink_proc, EchoProcessor())
    words = [("hello", 50, 100), ("world", 150, 100)]
    page, _ = synth_page(words)
    results = eng.extract([page])
    r = results[0]
    assert len(r["words"]) == 2
    assert len(r["lines"]) == 1
    assert r["lines"][0]["text"] == "w0 w1"
    assert r["meta"]["format"] == "xywh"
    # word ids referenced by the line exist
    ids = {wd["id"] for wd in r["words"]}
    assert set(r["lines"][0]["wordids"]) <= ids


def test_pipeline_engine_xyxy_and_regions(ink_proc):
    from marie_tpu.document.ocr_processor import OcrProcessor

    class EchoProcessor(OcrProcessor):
        def recognize_from_fragments(self, fragments):
            return [{"text": "t", "confidence": 1.0} for _ in fragments]

    eng = PipelineOcrEngine(ink_proc, EchoProcessor())
    page, boxes = synth_page([("hello", 50, 100)])
    r = eng.extract([page], coordinate_format=CoordinateFormat.XYXY)[0]
    b = r["words"][0]["box"]
    assert b[2] > b[0] and b[3] > b[1]  # xyxy

    regions = [{"id": "r1", "pageIndex": 0, "x": 40, "y": 90, "w": 100, "h": 40}]
    out = eng.extract([page], regions=regions)
    assert out[0]["id"] == "r1"
    assert out[0]["text"] == "t"

    with pytest.raises(ValueError):
        eng.extract([page], regions=[{"id": "bad"}])


def test_voting_engine(ink_proc):
    from marie_tpu.document.ocr_processor import OcrProcessor
    from marie_tpu.ocr.voting_ocr_engine import VotingOcrEngine

    class Fixed(OcrProcessor):
        def __init__(self, text, conf):
            super().__init__()
            self._t, self._c = text, conf

        def recognize_from_fragments(self, fragments):
            return [{"text": self._t, "confidence": self._c} for _ in fragments]

    eng = VotingOcrEngine(
        ink_proc, [Fixed("yes", 0.8), Fixed("yes", 0.7), Fixed("no", 0.99)]
    )
    page, _ = synth_page([("hello", 50, 100)])
    r = eng.extract([page])[0]
    assert r["words"][0]["text"] == "yes"  # majority wins over confidence
    assert r["words"][0]["confidence"] == pytest.approx(0.75, abs=1e-6)
