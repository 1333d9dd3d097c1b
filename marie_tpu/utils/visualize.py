"""OCR debug visualization + training-data harvesting.

Capability parity with ``marie/utils/visualize.py`` and
``marie/utils/ocr_debug.py``: draw detection/recognition overlays for
eyeballing a page, and dump low-confidence word crops to disk under
filesystem-safe names — the loop the reference uses to harvest
hard examples from production traffic for retraining.
"""

import os
import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from marie_tpu.helper import ensure_exists

# confidence → overlay color (high=green, mid=orange, low=red)
_BANDS = ((0.95, (0, 170, 0)), (0.8, (255, 140, 0)), (0.0, (220, 30, 30)))


def _color_for(conf: float) -> Tuple[int, int, int]:
    for floor, color in _BANDS:
        if conf >= floor:
            return color
    return _BANDS[-1][1]


def normalize_label(text: str) -> str:
    """Filesystem-safe crop name (reference ``normalize_label`` —
    a replacement table; here one regex pass keeps it reversible enough
    for eyeballing while guaranteeing a safe path component)."""
    safe = re.sub(r"[^A-Za-z0-9]+", "_", text).strip("_")
    return safe or "blank"


def draw_ocr_overlay(
    frame: np.ndarray,
    ocr_result: Dict[str, Any],
    path: Optional[str] = None,
    show_text: bool = True,
) -> np.ndarray:
    """Draw word boxes (colored by confidence) and optional recognized
    text onto a copy of the page; saves to ``path`` when given."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.asarray(frame)).convert("RGB")
    draw = ImageDraw.Draw(img)
    for w in ocr_result.get("words", []):
        x, y, bw, bh = [int(v) for v in w.get("box", (0, 0, 0, 0))]
        conf = float(w.get("confidence", 1.0))
        color = _color_for(conf)
        draw.rectangle([x, y, x + bw, y + bh], outline=color, width=2)
        if show_text and w.get("text"):
            draw.text((x, max(y - 12, 0)), f"{w['text']} {conf:.2f}", fill=color)
    out = np.asarray(img)
    if path:
        img.save(path)
    return out


def dump_low_confidence_crops(
    frame: np.ndarray,
    ocr_result: Dict[str, Any],
    out_dir: str,
    threshold: float = 0.90,
    pad: int = 2,
) -> List[str]:
    """Save a crop per word whose confidence is below ``threshold``,
    named ``{conf:.4f}_{text}_{i}.png`` (reference ``dump_bboxes``
    harvesting loop).  Returns the written paths."""
    from PIL import Image

    ensure_exists(out_dir)
    arr = np.asarray(frame)
    h, w_img = arr.shape[:2]
    written: List[str] = []
    for i, w in enumerate(ocr_result.get("words", [])):
        conf = float(w.get("confidence", 1.0))
        if conf >= threshold:
            continue
        x, y, bw, bh = [int(v) for v in w.get("box", (0, 0, 0, 0))]
        x0, y0 = max(x - pad, 0), max(y - pad, 0)
        x1, y1 = min(x + bw + pad, w_img), min(y + bh + pad, h)
        if x1 <= x0 or y1 <= y0:
            continue
        name = f"{conf:.4f}_{normalize_label(w.get('text', ''))[:48]}_{i}.png"
        path = os.path.join(out_dir, name)
        Image.fromarray(arr[y0:y1, x0:x1]).save(path)
        written.append(path)
    return written
