"""Golden-file regression for the OCR result schema.

The reference's parity oracle runs the CPU pipeline on fixed inputs and
asserts word/box/line JSON equality (SURVEY.md §7 "Parity oracle"); here
the oracle is the deterministic ink-detection path on a fixed synthetic
page — any change to detection, line grouping, reading order or the
result schema shows up as a golden diff.
"""

import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_ocr_result.json")


def _build_result():
    from marie_tpu.boxes.ink_box_processor import InkBoxProcessor
    from marie_tpu.document.ocr_processor import OcrProcessor
    from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
    from tests.helpers import synth_page

    class DeterministicRecognizer(OcrProcessor):
        def recognize_from_fragments(self, fragments):
            # text derived from fragment geometry -> fully deterministic
            return [
                {
                    "text": f"w{f.shape[1]}x{f.shape[0]}",
                    "confidence": round(0.5 + (f.shape[1] % 50) / 100, 3),
                }
                for f in fragments
            ]

    words = [
        ("alpha", 50, 60), ("beta", 150, 62), ("gamma", 260, 58),
        ("delta", 50, 120), ("epsilon", 170, 121),
        ("zeta", 50, 200),
    ]
    page, _ = synth_page(words, size=(320, 400))
    engine = PipelineOcrEngine(InkBoxProcessor(), DeterministicRecognizer())
    return engine.extract([page])


def test_ocr_result_matches_golden():
    results = _build_result()
    payload = json.loads(json.dumps(results, default=int))
    if not os.path.exists(GOLDEN):
        with open(GOLDEN, "w") as fp:
            json.dump(payload, fp, indent=1, sort_keys=True)
        pytest.skip("golden file created; rerun to compare")
    with open(GOLDEN) as fp:
        golden = json.load(fp)
    assert json.loads(json.dumps(payload, sort_keys=True)) == golden


def test_schema_contract():
    results = _build_result()
    r = results[0]
    assert set(r) == {"meta", "words", "lines"}
    assert {"imageSize", "page", "lang", "lines", "lines_bboxes", "format"} <= set(
        r["meta"]
    )
    assert len(r["lines"]) == 3  # three text rows
    ids = [w["id"] for w in r["words"]]
    word_indexes = [w["word_index"] for w in r["words"]]
    assert word_indexes == sorted(word_indexes)
    for line in r["lines"]:
        assert set(line["wordids"]) <= set(ids)
        assert line["text"]
        assert len(line["bbox"]) == 4
