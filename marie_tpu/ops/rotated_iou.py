"""Exact rotated-box IoU — XLA-native polygon clipping.

Equivalent of detectron2's ``box_iou_rotated`` CPU/CUDA kernels
(``/root/reference/marie/models/textfusenet/detectron2/layers/csrc/box_iou_rotated/``),
re-designed for TPU: the data-dependent polygon-clipping loop of the CUDA
kernel becomes a **fixed-trip-count** Sutherland–Hodgman clip with an
8-slot vertex buffer (clipping a convex quad against 4 half-planes grows
it by at most one vertex per plane: 4→8), fully vectorised with ``vmap``
so the whole pairwise matrix is one fused program.

Rotated boxes are ``(cx, cy, w, h, angle)`` with angle in **degrees CCW**
(detectron2 RotatedBoxes convention).
"""

import jax
import jax.numpy as jnp

_MAX_VERTS = 8
_EPS = 1e-8


def box_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 5] rotated boxes -> [..., 4, 2] corner points (CCW winding)."""
    cx, cy, w, h, ang = (boxes[..., i] for i in range(5))
    theta = jnp.deg2rad(ang)
    c, s = jnp.cos(theta), jnp.sin(theta)
    dx, dy = w / 2.0, h / 2.0
    # local corners in CCW order
    local = jnp.stack(
        [
            jnp.stack([dx, dy], axis=-1),
            jnp.stack([-dx, dy], axis=-1),
            jnp.stack([-dx, -dy], axis=-1),
            jnp.stack([dx, -dy], axis=-1),
        ],
        axis=-2,
    )  # [..., 4, 2]
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )  # [..., 2, 2]
    world = jnp.einsum("...ij,...kj->...ki", rot, local)
    center = jnp.stack([cx, cy], axis=-1)[..., None, :]
    return world + center


def _clip_halfplane(pts, n, e1, e2):
    """Clip polygon (pts[:_MAX_VERTS], count n) against the half-plane on
    the left of directed edge e1->e2.  Fixed shapes throughout."""
    edge = e2 - e1
    # signed distance of every buffered vertex to the edge (left positive)
    rel = pts - e1[None, :]
    d = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]  # cross(edge, p-e1)

    idx = jnp.arange(_MAX_VERTS)
    valid = idx < n
    nxt_idx = jnp.where(idx + 1 >= n, 0, idx + 1)
    p, q = pts, pts[nxt_idx]
    dp, dq = d, d[nxt_idx]

    inside_p = dp >= 0
    inside_q = dq >= 0
    crosses = (inside_p != inside_q) & valid
    emit_p = inside_p & valid

    t = dp / jnp.where(jnp.abs(dp - dq) < _EPS, _EPS, dp - dq)
    inter = p + t[:, None] * (q - p)

    # each edge emits [p?] then [intersection?] — compact via cumsum
    counts = emit_p.astype(jnp.int32) + crosses.astype(jnp.int32)
    starts = jnp.cumsum(counts) - counts
    pos_p = starts
    pos_x = starts + emit_p.astype(jnp.int32)

    out = jnp.zeros_like(pts)
    out = out.at[jnp.where(emit_p, pos_p, _MAX_VERTS)].set(p, mode="drop")
    out = out.at[jnp.where(crosses, pos_x, _MAX_VERTS)].set(inter, mode="drop")
    return out, jnp.sum(counts)


def _poly_area(pts: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of the first n points in an 8-slot buffer."""
    idx = jnp.arange(_MAX_VERTS)
    valid = idx < n
    nxt_idx = jnp.where(idx + 1 >= n, 0, idx + 1)
    x, y = pts[:, 0], pts[:, 1]
    xn, yn = x[nxt_idx], y[nxt_idx]
    cross = jnp.where(valid, x * yn - xn * y, 0.0)
    return jnp.abs(jnp.sum(cross)) / 2.0


def _intersection_area(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of two rotated boxes ([5] each)."""
    ca = box_corners(box_a)  # [4,2]
    cb = box_corners(box_b)
    pts = jnp.zeros((_MAX_VERTS, 2), box_a.dtype).at[:4].set(ca)
    n = jnp.asarray(4, jnp.int32)
    for k in range(4):
        pts, n = _clip_halfplane(pts, n, cb[k], cb[(k + 1) % 4])
    return jnp.where(n >= 3, _poly_area(pts, n), 0.0)


def rotated_iou(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of two rotated boxes ([5] each) -> scalar."""
    inter = _intersection_area(box_a, box_b)
    area_a = box_a[2] * box_a[3]
    area_b = box_b[2] * box_b[3]
    union = area_a + area_b - inter
    return jnp.where(union > _EPS, inter / union, 0.0)


@jax.jit
def pairwise_rotated_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N,5] x [M,5] -> [N,M] IoU matrix, one fused program."""
    return jax.vmap(lambda a: jax.vmap(lambda b: rotated_iou(a, b))(boxes_b))(boxes_a)
