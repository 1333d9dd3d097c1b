"""LayoutReader-parity loader: checkpointed reading-order model.

Mirrors the reference's ``marie.document.layoutreader`` package
(``/root/reference/marie/document/layoutreader/text_layout.py``) —
``TextLayout`` re-orders OCR words into human reading order.  Here the
model is the one-pass geometric ranker of
:mod:`marie_tpu.models.reading_order`, trained in-repo on synthetic
ReadingBank-style layouts (``marie_tpu/train/reading_order.py``).
"""

import os
from typing import Optional

from marie_tpu.models.reading_order import ReadingOrderConfig, TextLayout

_DEFAULT_CKPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "model_zoo",
    "reading-order-synth",
)


def load_text_layout(
    checkpoint: Optional[str] = None,
    config: Optional[ReadingOrderConfig] = None,
) -> TextLayout:
    """TextLayout with trained weights (random-init fallback if absent)."""
    cfg = config or ReadingOrderConfig.base()
    path = checkpoint or _DEFAULT_CKPT
    params = None
    if os.path.isdir(path):
        from marie_tpu.registry.checkpoints import load_params

        params = load_params(path)
    return TextLayout(cfg, params)


def reorder_page_result(result: dict, text_layout: TextLayout) -> dict:
    """Re-order an assembled page result's words into model reading order.

    ``result`` is the schema of
    :func:`marie_tpu.document.ocr_processor.assemble_page_result`
    (``{"meta", "words", "lines"}``); the reference applies LayoutReader
    at the same point — after OCR, before NER/indexing
    (``ner_extraction_executor.py``).  Word ``id``s are re-assigned to
    the new order and each line's ``wordids``/text follow.
    """
    words = result.get("words", [])
    if len(words) < 2:
        return result
    w = result["meta"]["imageSize"]["width"]
    h = result["meta"]["imageSize"]["height"]
    scale = max(w, h)
    boxes = [
        [
            wd["box"][0],
            wd["box"][1],
            wd["box"][0] + wd["box"][2],
            wd["box"][1] + wd["box"][3],
        ]
        for wd in words
    ]
    order = text_layout.order(boxes, scale=float(scale))
    new_words = []
    id_map = {}
    for new_id, old_idx in enumerate(order):
        wd = dict(words[old_idx])
        id_map[wd["id"]] = new_id
        wd["id"] = new_id
        new_words.append(wd)
    out = dict(result)
    out["words"] = new_words
    new_lines = []
    for line in result.get("lines", []):
        ln = dict(line)
        ids = sorted(id_map[i] for i in line.get("wordids", []) if i in id_map)
        ln["wordids"] = ids
        by_id = {wd["id"]: wd["text"] for wd in new_words}
        ln["text"] = " ".join(by_id[i] for i in ids)
        new_lines.append(ln)
    out["lines"] = new_lines
    return out


__all__ = [
    "TextLayout",
    "ReadingOrderConfig",
    "load_text_layout",
    "reorder_page_result",
]
