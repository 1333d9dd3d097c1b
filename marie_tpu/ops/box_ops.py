"""Axis-aligned box ops (jnp, static shapes).

Equivalent capability to the reference's box utilities
(``/root/reference/marie/utils/overlap.py`` and detectron2 Boxes), but
vectorised for device execution.
Boxes are float arrays ``[N, 4]`` in xyxy unless stated otherwise.
"""

import jax.numpy as jnp


def boxes_xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def boxes_xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x0, y0, x1 - x0, y1 - y0], axis=-1)


def boxes_cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, clamped at zero. [..., 4] -> [...]."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. [N,4] x [M,4] -> [N,M]."""
    a = boxes_a[:, None, :]  # [N,1,4]
    b = boxes_b[None, :, :]  # [1,M,4]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a)[:, None] + box_area(boxes_b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_intersection_over_min(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection / min(area) — the overlap metric the reference
    uses for merging fragments into blocks (marie/utils/overlap.py)."""
    a = boxes_a[:, None, :]
    b = boxes_b[None, :, :]
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    min_area = jnp.minimum(box_area(boxes_a)[:, None], box_area(boxes_b)[None, :])
    return jnp.where(min_area > 0, inter / min_area, 0.0)
