"""Non-maximum suppression — TPU-native, static-shape.

Equivalent of the reference's detectron2 csrc ``nms_rotated``
(``/root/reference/marie/models/textfusenet/detectron2/layers/csrc/nms_rotated/``)
and torchvision NMS the detectron predictor relies on, re-designed for XLA:
instead of a data-dependent suppression loop, we sort by score, build the
full pairwise IoU matrix once (one big MXU/VPU-friendly computation) and run
a fixed-trip-count ``fori_loop`` over ranks updating a keep mask.  O(N²)
memory, but N is the padded per-page box budget (≤ 4096) so the matrix
stays small and there is exactly ONE compiled program regardless of how
many real boxes a page has.
"""

from functools import partial

import jax
import jax.numpy as jnp

from marie_tpu.ops.box_ops import box_iou
from marie_tpu.ops.rotated_iou import pairwise_rotated_iou


@partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    valid_mask: jnp.ndarray | None = None,
    max_outputs: int | None = None,
):
    """Greedy NMS over xyxy boxes.

    Args:
      boxes: [N, 4] xyxy (padded rows allowed).
      scores: [N] scores; padded rows should carry score <= 0 or be masked.
      iou_threshold: suppress boxes with IoU > threshold against a kept box.
      valid_mask: optional [N] bool marking real boxes.
      max_outputs: if set, keep at most this many (by score).

    Returns:
      keep: [N] bool mask of surviving boxes (in input order).
      order: [N] int32 indices sorted by descending score (for gathering).
    """
    n = boxes.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-masked_scores)
    sorted_boxes = boxes[order]
    sorted_valid = valid_mask[order]

    iou = box_iou(sorted_boxes, sorted_boxes)
    keep = _suppress(iou, sorted_valid, iou_threshold)

    if max_outputs is not None:
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        keep = keep & (rank < max_outputs)

    # scatter keep back to input order
    keep_input_order = jnp.zeros((n,), dtype=bool).at[order].set(keep)
    return keep_input_order, order


def _suppress(iou: jnp.ndarray, valid: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Sequential-greedy suppression on a score-sorted IoU matrix."""
    n = iou.shape[0]

    def body(i, keep):
        # row i suppresses lower-ranked boxes only if i itself is kept
        suppress = (iou[i] > thresh) & keep[i]
        idx = jnp.arange(n)
        keep = jnp.where((idx > i) & suppress, False, keep)
        return keep

    return jax.lax.fori_loop(0, n, body, valid)


@partial(jax.jit, static_argnames=("max_outputs",))
def rotated_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    valid_mask: jnp.ndarray | None = None,
    max_outputs: int | None = None,
):
    """Greedy NMS over rotated boxes [N, 5] = (cx, cy, w, h, angle_deg).

    Angle convention matches detectron2's RotatedBoxes (degrees, CCW).
    """
    n = boxes.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), dtype=bool)
    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)
    masked_scores = jnp.where(valid_mask, scores, neg_inf)
    order = jnp.argsort(-masked_scores)
    sorted_boxes = boxes[order]
    sorted_valid = valid_mask[order]

    iou = pairwise_rotated_iou(sorted_boxes, sorted_boxes)
    keep = _suppress(iou, sorted_valid, iou_threshold)

    if max_outputs is not None:
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        keep = keep & (rank < max_outputs)

    keep_input_order = jnp.zeros((n,), dtype=bool).at[order].set(keep)
    return keep_input_order, order


def batched_nms(boxes, scores, class_ids, iou_threshold=0.5, valid_mask=None):
    """Class-aware NMS: boxes of different classes never suppress each other.

    Implemented with the detectron2 coordinate-offset trick — shift each
    class's boxes to a disjoint region so one plain NMS call handles all
    classes in a single compiled program.
    """
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = class_ids.astype(boxes.dtype)[:, None] * (2.0 * max_coord)
    return nms(boxes + offsets, scores, iou_threshold, valid_mask)
