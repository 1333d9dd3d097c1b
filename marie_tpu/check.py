"""Result-drift checker — compares two OCR result sets.

Counterpart of the reference's model-drift checker (``marie/check/``) and
the parity oracle of SURVEY.md §7: given golden and candidate page
results (the meta/words/lines schema), reports detection IoU, text CER
and aggregate drift so model or pipeline changes are quantified.
"""

from typing import Any, Dict, List, Sequence

import numpy as np

from marie_tpu.train.recognizer import character_error_rate
from marie_tpu.utils.overlap import compute_iou


def _to_xyxy(box) -> List[float]:
    x, y, w, h = box
    return [x, y, x + w, y + h]


def match_words(
    golden_words: Sequence[Dict[str, Any]],
    candidate_words: Sequence[Dict[str, Any]],
    iou_threshold: float = 0.5,
):
    """Greedy IoU matching of word boxes. Returns list of (g_idx, c_idx)."""
    pairs = []
    used = set()
    for gi, gw in enumerate(golden_words):
        best, best_iou = None, iou_threshold
        for ci, cw in enumerate(candidate_words):
            if ci in used:
                continue
            iou = compute_iou(_to_xyxy(gw["box"]), _to_xyxy(cw["box"]))
            if iou > best_iou:
                best, best_iou = ci, iou
        if best is not None:
            used.add(best)
            pairs.append((gi, best))
    return pairs


def compare_results(
    golden: List[Dict[str, Any]],
    candidate: List[Dict[str, Any]],
    iou_threshold: float = 0.5,
) -> Dict[str, Any]:
    """Page-list vs page-list drift report.

    Returns {detection: {precision, recall, mean_iou}, recognition: {cer},
    pages: N, drift_detected: bool}.
    """
    tp = fp = fn = 0
    ious: List[float] = []
    cers: List[float] = []
    for g_page, c_page in zip(golden, candidate):
        gws = g_page.get("words", [])
        cws = c_page.get("words", [])
        pairs = match_words(gws, cws, iou_threshold)
        tp += len(pairs)
        fn += len(gws) - len(pairs)
        fp += len(cws) - len(pairs)
        for gi, ci in pairs:
            ious.append(
                compute_iou(_to_xyxy(gws[gi]["box"]), _to_xyxy(cws[ci]["box"]))
            )
            cers.append(
                character_error_rate(str(cws[ci]["text"]), str(gws[gi]["text"]))
            )
    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)
    report = {
        "pages": len(golden),
        "detection": {
            "precision": round(precision, 4),
            "recall": round(recall, 4),
            "mean_iou": round(float(np.mean(ious)) if ious else 0.0, 4),
            "matched": tp,
            "missing": fn,
            "spurious": fp,
        },
        "recognition": {
            "cer": round(float(np.mean(cers)) if cers else 1.0, 4),
        },
    }
    report["drift_detected"] = (
        precision < 0.95 or recall < 0.95 or report["recognition"]["cer"] > 0.05
    )
    return report
