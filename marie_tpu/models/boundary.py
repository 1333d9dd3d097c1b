"""Document-boundary detection + fit-to-page warp (TPU-native design).

The reference detects the physical page inside a scan with a trained
DiT + Mask R-CNN and aligns the frame to it
(``/root/reference/marie/components/document_registration/unilm_dit.py:100``,
``registration_method="fit_to_page"``).  Proposal-based instance
segmentation is hostile to static-shape XLA, and the boundary task has
exactly one instance with a known topology (a convex quad) — so the TPU
build regresses the four page corners directly with a small CNN and
performs the alignment as ONE homography-sampling program.  Corner
regression + perspective warp is strictly cheaper than mask inference +
contour fitting and returns the same ``fit_to_page`` result.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.configs import BoundaryConfig

Array = jnp.ndarray


class BoundaryNet(nn.Module):
    """[B, H, W, 3] float [0,1] -> [B, 8] corner coords in [0,1]
    (tl, tr, br, bl) × (x, y), normalized to the input frame."""

    cfg: BoundaryConfig

    @nn.compact
    def __call__(self, images: Array) -> Array:
        c = self.cfg.base_channels
        h = images
        for i in range(self.cfg.num_stages):
            h = nn.Conv(c * (2**min(i, 3)), (3, 3), strides=(2, 2), padding="SAME")(h)
            h = nn.GroupNorm(num_groups=None, group_size=1)(h)
            h = nn.relu(h)
        h = h.mean(axis=(1, 2))  # global average pool
        h = nn.relu(nn.Dense(self.cfg.mlp_dim)(h))
        out = nn.Dense(8)(h)
        return nn.sigmoid(out)


def homography_from_points(src: Array, dst: Array) -> Array:
    """Solve H (3x3, h22=1) with dst ~ H @ src from 4 correspondences.

    src, dst: [4, 2] float (x, y)."""
    x, y = src[:, 0], src[:, 1]
    xp, yp = dst[:, 0], dst[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_x = jnp.stack([x, y, ones, zeros, zeros, zeros, -x * xp, -y * xp], axis=-1)
    rows_y = jnp.stack([zeros, zeros, zeros, x, y, ones, -x * yp, -y * yp], axis=-1)
    a = jnp.concatenate([rows_x, rows_y], axis=0)  # [8, 8]
    b = jnp.concatenate([xp, yp], axis=0)  # [8]
    h = jnp.linalg.solve(a, b)
    return jnp.concatenate([h, jnp.ones((1,), h.dtype)]).reshape(3, 3)


def _apply_homography(h_mat: Array, xs: Array, ys: Array) -> Tuple[Array, Array]:
    denom = h_mat[2, 0] * xs + h_mat[2, 1] * ys + h_mat[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-8, 1e-8, denom)
    xo = (h_mat[0, 0] * xs + h_mat[0, 1] * ys + h_mat[0, 2]) / denom
    yo = (h_mat[1, 0] * xs + h_mat[1, 1] * ys + h_mat[1, 2]) / denom
    return xo, yo


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def warp_quad_to_page(image_u8: Array, corners_px: Array, out_h: int, out_w: int) -> Array:
    """Perspective-resample the quad ``corners_px`` (tl,tr,br,bl [4,2] xy in
    image pixels) onto a full (out_h, out_w) page — the ``fit_to_page``
    registration. Out-of-source samples render white."""
    from marie_tpu.preprocess.ops import _bilinear_hwc

    rect = jnp.asarray(
        [[0.0, 0.0], [out_w - 1.0, 0.0], [out_w - 1.0, out_h - 1.0], [0.0, out_h - 1.0]],
        jnp.float32,
    )
    h_mat = homography_from_points(rect, corners_px.astype(jnp.float32))
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    sx, sy = _apply_homography(h_mat, jnp.broadcast_to(xs, (out_h, out_w)),
                               jnp.broadcast_to(ys, (out_h, out_w)))
    rgb = image_u8.astype(jnp.float32)
    out = _bilinear_hwc(rgb, sy, sx)
    ih, iw = image_u8.shape[:2]
    oob = (sy < 0) | (sy > ih - 1) | (sx < 0) | (sx > iw - 1)
    out = jnp.where(oob[..., None], 255.0, out)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def composite_scan(doc_u8: Array, corners_px: Array, canvas_hw: Tuple[int, int],
                   bg_gray: Array, noise: Array) -> Array:
    """Place a document page INTO the quad of a synthetic scanner canvas
    (training-data generator; runs fully on device inside the train scan).

    doc_u8 [dh, dw, 3]; corners_px [4,2] xy quad in canvas coords;
    bg_gray scalar float; noise [H, W] float."""
    from marie_tpu.preprocess.ops import _bilinear_hwc

    ch, cw = canvas_hw
    dh, dw = doc_u8.shape[0], doc_u8.shape[1]
    quad = corners_px.astype(jnp.float32)
    rect = jnp.asarray(
        [[0.0, 0.0], [dw - 1.0, 0.0], [dw - 1.0, dh - 1.0], [0.0, dh - 1.0]],
        jnp.float32,
    )
    h_inv = homography_from_points(quad, rect)  # canvas -> doc coords
    ys = jnp.arange(ch, dtype=jnp.float32)[:, None]
    xs = jnp.arange(cw, dtype=jnp.float32)[None, :]
    dx, dy = _apply_homography(h_inv, jnp.broadcast_to(xs, (ch, cw)),
                               jnp.broadcast_to(ys, (ch, cw)))
    sampled = _bilinear_hwc(doc_u8.astype(jnp.float32), dy, dx)
    inside = (dx >= 0) & (dx <= dw - 1) & (dy >= 0) & (dy <= dh - 1)
    bg = jnp.clip(bg_gray + noise, 0, 255)[..., None] * jnp.ones((1, 1, 3))
    out = jnp.where(inside[..., None], sampled, bg)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def quad_iou(pred_px: Array, true_px: Array, hw: Tuple[int, int]) -> Array:
    """IoU of two convex quads by rasterized inside-tests at ``hw``."""
    h, w = hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    def inside(quad):
        q = quad.astype(jnp.float32)
        sign = None
        acc_pos = jnp.ones((h, w), bool)
        acc_neg = jnp.ones((h, w), bool)
        for i in range(4):
            ax, ay = q[i, 0], q[i, 1]
            bx, by = q[(i + 1) % 4, 0], q[(i + 1) % 4, 1]
            cross = (bx - ax) * (ys - ay) - (by - ay) * (xs - ax)
            acc_pos = acc_pos & (cross >= 0)
            acc_neg = acc_neg & (cross <= 0)
        del sign
        return acc_pos | acc_neg

    a = inside(pred_px)
    b = inside(true_px)
    inter = (a & b).sum()
    union = (a | b).sum()
    return inter / jnp.maximum(union, 1)
