"""VotingOcrEngine — ensemble recognition with word-level voting.

Behaviour parity with the reference
(``/root/reference/marie/ocr/voting_ocr_engine.py:23`` — runs multiple
engines, words are aligned by box and the majority text wins; confidence
is the vote-weighted mean).  Detection comes from the primary engine;
candidate engines re-recognise the SAME fragments so words align 1:1.
"""

from collections import Counter
from typing import Any, Dict, List, Sequence

import numpy as np

from marie_tpu.boxes.box_processor import BoxProcessor
from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.enums import CoordinateFormat, PSMode
from marie_tpu.ocr.ocr_engine import OcrEngine, PipelineOcrEngine, _as_frame_list


class VotingOcrEngine(PipelineOcrEngine):
    def __init__(
        self,
        box_processor: BoxProcessor,
        ocr_processors: Sequence[OcrProcessor],
        **kwargs,
    ):
        if len(ocr_processors) == 0:
            raise ValueError("VotingOcrEngine needs at least one ocr_processor")
        super().__init__(box_processor, ocr_processors[0], **kwargs)
        self.ocr_processors = list(ocr_processors)

    def _extract_fullpage(self, frames, pms_mode, coordinate_format, queue_id, **kwargs):
        frames = _as_frame_list(frames)
        if not any(p.is_available() for p in self.ocr_processors):
            raise RuntimeError(
                "VotingOcrEngine: no ocr_processor is available "
                f"({[type(p).__name__ for p in self.ocr_processors]})"
            )
        device_ready = (
            pms_mode in (PSMode.SPARSE, PSMode.LINE)
            and hasattr(self.box_processor, "detect_dispatch")
            and all(
                hasattr(p, "recognize_dispatch")
                for p in self.ocr_processors
                if p.is_available()
            )
        )
        if device_ready and getattr(self, "single_program", True):
            return self._extract_fullpage_device(
                frames, pms_mode, coordinate_format
            )
        results = []
        checksum = kwargs.get("checksum", "")
        for i, frame in enumerate(frames):
            boxes, fragments, lines, _, line_bboxes = (
                self.box_processor.extract_bounding_boxes(
                    queue_id, checksum, frame, pms_mode
                )
            )
            candidates = [
                proc.recognize_from_fragments(fragments)
                for proc in self.ocr_processors
                if proc.is_available()
            ]
            voted = [self._vote([c[j] for c in candidates]) for j in range(len(fragments))]

            # build the page result through the base processor's aligner by
            # substituting voted outputs
            result, _ = _RecognizeWith(voted).recognize(
                queue_id, checksum, frame, boxes, fragments, lines
            )
            if coordinate_format == CoordinateFormat.XYXY:
                for word in result["words"]:
                    x, y, w, h = word["box"]
                    word["box"] = [x, y, x + w, y + h]
            result["meta"]["page"] = i
            result["meta"]["lines"] = lines.tolist() if hasattr(lines, "tolist") else list(lines)
            result["meta"]["lines_bboxes"] = (
                line_bboxes.tolist() if hasattr(line_bboxes, "tolist") else list(line_bboxes)
            )
            result["meta"]["format"] = coordinate_format.name.lower()
            results.append(result)
        return results

    def _extract_fullpage_device(self, frames, pms_mode, coordinate_format):
        """Device path: ONE page upload feeds EVERY recogniser.

        Detection dispatches for all pages first (pipelined), then each
        available recogniser's fused crop+decode program runs against the
        same on-device page; candidate words align 1:1 by box so the vote
        is identical to the host-fragment path."""
        from marie_tpu.document.ocr_processor import assemble_page_result
        from marie_tpu.ocr.ocr_engine import _ensure_rgb_np, _tolist

        procs = [p for p in self.ocr_processors if p.is_available()]
        handles = [
            self.box_processor.detect_dispatch(_ensure_rgb_np(f)) for f in frames
        ]
        per_page = []
        futures = [[] for _ in procs]  # futures[k][i] = proc k, page i
        for i, frame in enumerate(frames):
            raw_boxes, scores = self.box_processor.detect_collect(handles[i])
            page_dev, scale = handles[i][1], handles[i][2]
            boxes, scores, lines, line_bboxes = self.box_processor.organize_boxes(
                raw_boxes, scores, frame.shape[:2], pms_mode
            )
            per_page.append((frame, boxes, lines, line_bboxes))
            for k, proc in enumerate(procs):
                futures[k].append(
                    proc.recognize_dispatch(page_dev, boxes, scale)
                )
        collected = [
            proc.recognize_collect_many(futures[k])
            for k, proc in enumerate(procs)
        ]

        results = []
        for i, (frame, boxes, lines, line_bboxes) in enumerate(per_page):
            candidates = [collected[k][i] for k in range(len(procs))]
            voted = [
                self._vote([c[j] for c in candidates])
                for j in range(len(boxes))
            ]
            result = assemble_page_result(
                (frame.shape[0], frame.shape[1]), boxes, lines, voted
            )
            if coordinate_format == CoordinateFormat.XYXY:
                for word in result["words"]:
                    x, y, w, h = word["box"]
                    word["box"] = [x, y, x + w, y + h]
            result["meta"]["page"] = i
            result["meta"]["lines"] = _tolist(lines)
            result["meta"]["lines_bboxes"] = _tolist(line_bboxes)
            result["meta"]["format"] = coordinate_format.name.lower()
            results.append(result)
        return results

    @staticmethod
    def _vote(candidates: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Majority text vote; ties broken by max confidence."""
        if not candidates:
            # every processor reported unavailable — empty word, zero conf
            return {"text": "", "confidence": 0.0}
        texts = [c["text"] for c in candidates]
        counts = Counter(texts)
        top_count = counts.most_common(1)[0][1]
        tied = [t for t, n in counts.items() if n == top_count]
        best_text = max(
            tied,
            key=lambda t: max(
                c["confidence"] for c in candidates if c["text"] == t
            ),
        )
        confs = [c["confidence"] for c in candidates if c["text"] == best_text]
        return {"text": best_text, "confidence": float(np.mean(confs))}


class _RecognizeWith(OcrProcessor):
    """Adapter feeding pre-computed word results through the base aligner."""

    def __init__(self, results: List[Dict[str, Any]]):
        super().__init__()
        self._results = results

    def recognize_from_fragments(self, fragments):
        return self._results
