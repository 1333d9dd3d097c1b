"""OCR debug overlay + low-confidence crop harvesting (reference
marie/utils/{visualize,ocr_debug}.py analogs)."""

import os

import numpy as np

from marie_tpu.utils.visualize import (
    draw_ocr_overlay,
    dump_low_confidence_crops,
    normalize_label,
)

RESULT = {
    "words": [
        {"text": "GOOD", "box": [10, 10, 40, 12], "confidence": 0.99},
        {"text": "so-so", "box": [60, 10, 40, 12], "confidence": 0.85},
        {"text": "b@d/1", "box": [10, 40, 40, 12], "confidence": 0.41},
    ]
}


def _page():
    return np.full((80, 120, 3), 255, np.uint8)


def test_overlay_draws_and_saves(tmp_path):
    out = draw_ocr_overlay(_page(), RESULT, path=str(tmp_path / "o.png"))
    assert out.shape == (80, 120, 3)
    assert (out != 255).any()  # something was drawn
    assert os.path.exists(tmp_path / "o.png")


def test_dump_low_confidence_crops(tmp_path):
    paths = dump_low_confidence_crops(
        _page(), RESULT, str(tmp_path / "crops"), threshold=0.90
    )
    names = sorted(os.path.basename(p) for p in paths)
    assert len(names) == 2  # 0.85 and 0.41, not 0.99
    assert names[0].startswith("0.4100_b_d_1")
    assert names[1].startswith("0.8500_so_so")
    for p in paths:
        assert os.path.getsize(p) > 0


def test_normalize_label():
    assert normalize_label("TOTAL: $42.00") == "TOTAL_42_00"
    assert normalize_label("   ") == "blank"


def test_crop_clamps_to_page(tmp_path):
    result = {"words": [
        {"text": "edge", "box": [110, 70, 40, 40], "confidence": 0.1},
        {"text": "degenerate", "box": [200, 200, 5, 5], "confidence": 0.1},
    ]}
    paths = dump_low_confidence_crops(_page(), result, str(tmp_path), 0.9)
    assert len(paths) == 1  # off-page box skipped, edge box clamped
