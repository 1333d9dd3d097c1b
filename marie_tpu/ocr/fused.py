"""Single-program page OCR: detection + box selection + crop + decode in
ONE XLA program per page.

The reference runs detection (``boxes/craft_box_processor.py``) and
recognition (``document/trocr_ocr_processor.py``) as separate GPU passes
with OpenCV box post-processing on host in between.  The repo's two-phase
pipeline already keeps pixels on device; this module removes the LAST
host round trip: the CRAFT forward, connected components, score/area box
filtering, top-K selection, crop_resize, and the full greedy decode run
as one fused program — per page ONE dispatch goes out and ONE result
struct comes back.  Under a high-latency device link (the axon relay)
this halves per-page round trips; on directly-attached TPUs it removes a
host sync and lets XLA overlap detection epilogue with encoder prologue.

Row alignment contract: the device keeps boxes with
``valid & score >= floor & area >= min_area`` and decodes them in
ascending component-slot order.  The host applies the IDENTICAL
predicate to the same fetched stats (``detect_collect(return_rows=True)``)
so the j-th surviving host box is exactly decoded row j — no index
arrays cross the wire.
"""

from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.boxes.craft_box_processor import _detect_jit
from marie_tpu.models.trocr import greedy_decode
from marie_tpu.preprocess.ops import crop_resize


@partial(
    jax.jit,
    static_argnames=(
        "craft_model",
        "trocr_model",
        "max_components",
        "box_source",
        "rec_slots",
        "out_h",
        "out_w",
        "dtype",
        "max_steps",
    ),
)
def _fused_page(
    craft_model,
    craft_vars,
    trocr_model,
    trocr_params,
    page_u8: jnp.ndarray,  # [H, W, 3] uint8, bucket-padded
    clip_wh: jnp.ndarray,  # [2] float32: scaled-original (w, h) crop clip
    text_threshold: float,
    low_text: float,
    link_threshold: float,
    min_area: float,
    box_expand: float,
    max_components: int,
    box_source: str,
    rec_slots: int,
    out_h: int,
    out_w: int,
    dtype,
    max_steps: int,
):
    stats = _detect_jit(
        craft_model, craft_vars, page_u8,
        text_threshold, low_text, link_threshold, max_components, box_source,
    )
    boxes = stats["boxes"].astype(jnp.float32)  # [M,4] xyxy grid coords
    scores = stats["scores"]
    areas = stats["areas"]
    valid = stats["valid"]
    stride = stats["stride"].astype(jnp.float32)

    # identical predicate to BoxProcessorCraft.detect_collect
    score_floor = 0.0 if box_source == "ink" else text_threshold
    min_area_grid = min_area / (stride / 2.0) ** 2
    keep = valid & (scores >= score_floor) & (areas >= min_area_grid)

    # kept slots first, in ascending slot order (matches host nonzero order)
    m = boxes.shape[0]
    slot = jnp.arange(m)
    sel = jnp.argsort(jnp.where(keep, slot, m + slot))[:rec_slots]
    sel_keep = keep[sel]

    b = boxes[sel] * stride  # grid -> padded-page pixels
    bw = b[:, 2] - b[:, 0]
    bh = b[:, 3] - b[:, 1]
    b = b + jnp.stack([-bw, -bh, bw, bh], axis=-1) * box_expand
    lo = jnp.zeros((4,), jnp.float32)
    hi = jnp.stack([clip_wh[0], clip_wh[1], clip_wh[0], clip_wh[1]])
    b = jnp.clip(b, lo, hi)
    b = jnp.where(sel_keep[:, None], b, jnp.asarray([0.0, 0.0, 1.0, 1.0]))

    rgb = page_u8.astype(jnp.float32) / 255.0
    crops, _ = crop_resize(rgb, b, out_h, out_w)
    tokens, _, conf = greedy_decode(
        trocr_model, trocr_params, crops.astype(dtype), max_steps
    )
    return stats, tokens, conf


def supports_fused_page(box_processor, ocr_processor) -> bool:
    """Duck-typed gate: CRAFT-style detector + greedy TrOCR recogniser."""
    return (
        hasattr(box_processor, "prep_page")
        and hasattr(box_processor, "detect_collect")
        and hasattr(ocr_processor, "tokenizer")
        and hasattr(ocr_processor, "decode_steps")
        and getattr(ocr_processor, "beam_size", 0) == 1
    )


def fused_dispatch(box_processor, ocr_processor, image: np.ndarray,
                   rec_slots: int = 256):
    """Upload one page and launch the fused program WITHOUT waiting."""
    bp, op = box_processor, ocr_processor
    padded, scale, (h, w) = bp.prep_page(image)
    page_dev = jnp.asarray(padded)
    clip_wh = jnp.asarray([w * scale, h * scale], jnp.float32)
    stats, tokens, conf = _fused_page(
        bp.model, bp.variables, op.model, op.params, page_dev, clip_wh,
        bp.text_threshold, bp.low_text, bp.link_threshold,
        float(bp.min_area), float(bp.box_expand),
        bp.max_components, bp.box_source, rec_slots,
        op.crop_h, op.crop_w, op.compute_dtype, op.decode_steps,
    )
    return (stats, tokens, conf, page_dev, scale, (h, w), rec_slots)


def fused_collect_many(
    box_processor, ocr_processor, handles, pms_modes
) -> List[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, List[Dict[str, Any]]]]:
    """Collect MANY fused pages with ONE device→host transfer.

    Returns per page: (boxes_int xywh organized, scores, lines,
    line_bboxes, word dicts aligned to the organized boxes).
    """
    bp, op = box_processor, ocr_processor
    if not handles:
        return []
    # single batched fetch: stack every per-page array (same shapes — all
    # pages share max_components / rec_slots / decode_steps)
    stacked_stats = {
        k: jnp.stack([h[0][k] for h in handles]) for k in handles[0][0]
    }
    toks = jnp.stack([h[1] for h in handles])
    confs = jnp.stack([h[2] for h in handles])
    stats_host, tokens_host, conf_host = jax.device_get(
        (stacked_stats, toks, confs)
    )

    out = []
    for i, handle in enumerate(handles):
        _, _, _, page_dev, scale, (h, w), rec_slots = handle
        stats_i = {k: stats_host[k][i] for k in stats_host}
        xywh, scores, rows = bp.detect_collect(
            (None, page_dev, scale, (h, w)), stats=stats_i, return_rows=True
        )
        boxes_int, scores_o, lines, line_bboxes, order = bp.organize_boxes(
            xywh, scores, (h, w), pms_modes[i], return_order=True
        )
        words: List[Dict[str, Any]] = []
        overflow: List[int] = []  # organized positions decoded past rec_slots
        for j in range(len(boxes_int)):
            row = int(rows[order[j]])
            if row < rec_slots:
                words.append(
                    {
                        "text": op.tokenizer.decode(tokens_host[i, row]),
                        "confidence": float(conf_host[i, row]),
                    }
                )
            else:
                words.append({"text": "", "confidence": 0.0})
                overflow.append(j)
        if overflow:
            # >rec_slots kept boxes on this page — recognise the tail with
            # the regular fused-crop path (rare; one extra dispatch)
            tail = np.asarray([boxes_int[j] for j in overflow], np.float32)
            fut = op.recognize_dispatch(page_dev, tail, scale)
            for j, wd in zip(overflow, op.recognize_collect(fut)):
                words[j] = wd
        out.append((boxes_int, scores_o, lines, line_bboxes, words))
    return out
