"""OcrProcessor base — recognition over detected word fragments.

Output-contract parity with the reference
(``/root/reference/marie/document/ocr_processor.py`` ``recognize``):

    result = {
      "meta":  {"imageSize": {...}, "page": 0, "lang": "en"},
      "words": [{"id", "text", "confidence", "box", "line", "word_index"}],
      "lines": [{"line", "wordids", "text", "bbox", "confidence"}],
    }

Words are re-indexed left-to-right, then aligned line-by-line; line text
is the space-join of its words; line bbox is the block union.
"""

from abc import abstractmethod
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np

from marie_tpu.jaml import JAMLCompatible
from marie_tpu.logging_core import MarieLogger
from marie_tpu.utils.overlap import merge_bboxes_as_block


class OcrProcessor(JAMLCompatible):
    def __init__(self, work_dir: str = "/tmp/icr", **kwargs):
        self.work_dir = work_dir
        self.logger = MarieLogger(type(self).__name__)

    def is_available(self) -> bool:
        return True

    @abstractmethod
    def recognize_from_fragments(
        self, fragments: Sequence[np.ndarray]
    ) -> List[Dict[str, Any]]:
        """List of word images -> list of {"text", "confidence"}."""

    def recognize(
        self,
        queue_id: str,
        checksum: str,
        image: np.ndarray,
        boxes: Sequence[Sequence[int]],
        fragments: Sequence[np.ndarray],
        lines: Sequence[int],
        **kwargs,
    ) -> Tuple[Dict[str, Any], np.ndarray]:
        """Full-page recognition -> (result dict, overlay image)."""
        assert len(boxes) == len(fragments) == len(lines)
        h, w = image.shape[0], image.shape[1]
        overlay = np.full((h, w, 3), 255, np.uint8)
        if len(boxes) == 0:
            return assemble_page_result((h, w), [], [], []), overlay
        results = self.recognize_from_fragments(fragments)
        assert len(results) == len(fragments)
        return assemble_page_result((h, w), boxes, lines, results), overlay

    def extract_text(self, _id: str, key: str, image: np.ndarray) -> str:
        """Single pre-cropped word/line image -> text (low-level API)."""
        out = self.recognize_from_fragments([image])
        return out[0]["text"]


def assemble_page_result(
    image_hw: Tuple[int, int],
    boxes: Sequence[Sequence[int]],
    lines: Sequence[int],
    results: Sequence[Dict[str, Any]],
) -> Dict[str, Any]:
    """Build the reference's page result schema from recognised words.

    Words are re-indexed left-to-right then aligned line-by-line; each
    line's text is the space-join of its words, bbox the block union
    (reference ocr_processor.py recognize()).
    """
    h, w = image_hw
    meta = {
        "imageSize": {"width": int(w), "height": int(h)},
        "page": 0,
        "lang": "en",
    }
    if len(boxes) == 0:
        return {"meta": meta, "words": [], "lines": []}

    boxes_arr = np.asarray(boxes)
    lines_arr = np.asarray(lines)
    order = np.argsort(boxes_arr[:, 0], kind="stable")

    words: List[Dict[str, Any]] = []
    for i, idx in enumerate(order):
        ext = results[idx]
        wd = {
            "id": i,
            "text": ext["text"],
            "confidence": round(float(ext["confidence"]), 3),
            "box": [int(v) for v in boxes_arr[idx]],
            "line": int(lines_arr[idx]),
        }
        # carry extra per-word annotations (e.g. chained NER labels)
        for k, v in ext.items():
            if k not in wd:
                wd[k] = v
        words.append(wd)

    by_line: Dict[int, List[Dict[str, Any]]] = {}
    for wd in words:
        by_line.setdefault(wd["line"], []).append(wd)

    aligned_words: List[Dict[str, Any]] = []
    line_results: List[Dict[str, Any]] = []
    word_index = 0
    for li, line_no in enumerate(sorted(by_line)):
        picks = by_line[line_no]
        for wd in picks:
            wd["word_index"] = word_index
            aligned_words.append(wd)
            word_index += 1
        bbox = merge_bboxes_as_block([wd["box"] for wd in picks])
        line_results.append(
            {
                "line": li + 1,
                "wordids": [wd["id"] for wd in picks],
                "text": " ".join(wd["text"] for wd in picks),
                "bbox": bbox,
                "confidence": round(
                    float(np.mean([wd["confidence"] for wd in picks])), 4
                ),
            }
        )
    return {"meta": meta, "words": aligned_words, "lines": line_results}
