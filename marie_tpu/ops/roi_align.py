"""ROIAlign / ROIAlignRotated — gather-based XLA implementation.

Equivalent of the reference's detectron2 csrc
(``ROIAlign_cpu.cpp``/``ROIAlign_cuda.cu`` and the rotated variants,
``/root/reference/marie/models/textfusenet/detectron2/layers/csrc/ROIAlign*/``).
The CUDA kernels' per-thread bilinear interpolation becomes a batched
gather over precomputed sample coordinates — one `take`-heavy fused
program that XLA vectorises; static shapes: K rois × P×P bins × S×S
samples.

Conventions match detectron2 (aligned=True continuous coordinates).
"""

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """feat [C,H,W]; ys/xs arbitrary same-shape float coords -> [C, *coords]."""
    h, w = feat.shape[-2], feat.shape[-1]
    # detectron2 semantics: samples outside the map contribute 0
    oob = (ys < -1.0) | (ys > h) | (xs < -1.0) | (xs > w)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = ys - y0.astype(ys.dtype)
    lx = xs - x0.astype(xs.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = feat.reshape(feat.shape[0], -1)  # [C, H*W]

    def take(yi, xi):
        return flat[:, (yi * w + xi).reshape(-1)].reshape(
            (feat.shape[0],) + ys.shape
        )

    val = (
        take(y0, x0) * (hy * hx)
        + take(y0, x1) * (hy * lx)
        + take(y1, x0) * (ly * hx)
        + take(y1, x1) * (ly * lx)
    )
    return jnp.where(oob, 0.0, val)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align_single(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """ROIAlign over ONE feature map, differentiation-friendly.

    ``roi_align``'s per-roi ``features[batch_idx]`` gather is correct but
    its transpose (backward pass) materializes a full feature-map copy
    per ROI — a 6 GB HLO temp at K=2048 ROIs on a 128×96×64 map.  When
    every ROI lives in the same image (the TextFuseNet fuse module, any
    single-page program) this variant skips the batch gather so the
    backward is one scatter-add into [C,H,W].

    Args:
      feat: [C, H, W] single feature map.
      boxes: [K, 4] xyxy in feature coords (already scaled).
    Returns: [K, C, P, P].
    """
    p, s = output_size, max(sampling_ratio, 1)
    offset = 0.5 if aligned else 0.0
    x0 = boxes[:, 0] * spatial_scale - offset
    y0 = boxes[:, 1] * spatial_scale - offset
    x1 = boxes[:, 2] * spatial_scale - offset
    y1 = boxes[:, 3] * spatial_scale - offset
    rw, rh = x1 - x0, y1 - y0
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bins = jnp.arange(p, dtype=feat.dtype)
    samples = (jnp.arange(s, dtype=feat.dtype) + 0.5) / s
    frac = (bins[:, None] + samples[None, :]).reshape(-1)  # [P*S]
    ys = y0[:, None] + frac[None] * (rh / p)[:, None]      # [K, P*S]
    xs = x0[:, None] + frac[None] * (rw / p)[:, None]
    k = boxes.shape[0]
    grid_y = jnp.broadcast_to(ys[:, :, None], (k, p * s, p * s))
    grid_x = jnp.broadcast_to(xs[:, None, :], (k, p * s, p * s))
    vals = _bilinear_gather(feat, grid_y, grid_x)          # [C,K,PS,PS]
    vals = vals.reshape(feat.shape[0], k, p, s, p, s)
    return jnp.mean(vals, axis=(3, 5)).transpose(1, 0, 2, 3)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """ROIAlign.

    Args:
      features: [N, C, H, W] feature maps.
      rois: [K, 5] — (batch_idx, x0, y0, x1, y1) in input-image coords.
      output_size: P — output is P×P per roi.
      sampling_ratio: S — S×S bilinear samples per bin, averaged.
      aligned: half-pixel alignment (detectron2 `aligned=True`).

    Returns:
      [K, C, P, P]
    """
    p, s = output_size, max(sampling_ratio, 1)
    offset = 0.5 if aligned else 0.0
    batch_idx = rois[:, 0].astype(jnp.int32)
    x0 = rois[:, 1] * spatial_scale - offset
    y0 = rois[:, 2] * spatial_scale - offset
    x1 = rois[:, 3] * spatial_scale - offset
    y1 = rois[:, 4] * spatial_scale - offset
    rw = x1 - x0
    rh = y1 - y0
    if not aligned:
        rw = jnp.maximum(rw, 1.0)
        rh = jnp.maximum(rh, 1.0)
    bin_w = rw / p
    bin_h = rh / p

    # sample grid: [P, S] fractional positions within the roi, per axis
    bins = jnp.arange(p, dtype=features.dtype)
    samples = (jnp.arange(s, dtype=features.dtype) + 0.5) / s
    frac = bins[:, None] + samples[None, :]  # [P, S]

    # coords: [K, P, S]
    ys = y0[:, None, None] + frac[None] * bin_h[:, None, None]
    xs = x0[:, None, None] + frac[None] * bin_w[:, None, None]

    def one_roi(b, yy, xx):
        feat = features[b]  # [C,H,W]
        grid_y = yy[:, :, None, None]  # [P,S,1,1]
        grid_x = xx[None, None, :, :]  # [1,1,P,S]
        vals = _bilinear_gather(
            feat,
            jnp.broadcast_to(grid_y, (p, s, p, s)),
            jnp.broadcast_to(grid_x, (p, s, p, s)),
        )  # [C,P,S,P,S]
        return jnp.mean(vals, axis=(2, 4))  # [C,P,P]

    return jax.vmap(one_roi)(batch_idx, ys, xs)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align_rotated(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """ROIAlignRotated: rois [K, 6] = (batch_idx, cx, cy, w, h, angle_deg CCW).

    Returns [K, C, P, P].
    """
    p, s = output_size, max(sampling_ratio, 1)
    batch_idx = rois[:, 0].astype(jnp.int32)
    cx = rois[:, 1] * spatial_scale - 0.5
    cy = rois[:, 2] * spatial_scale - 0.5
    rw = rois[:, 3] * spatial_scale
    rh = rois[:, 4] * spatial_scale
    theta = jnp.deg2rad(rois[:, 5])
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    bins = jnp.arange(p, dtype=features.dtype)
    samples = (jnp.arange(s, dtype=features.dtype) + 0.5) / s
    frac = (bins[:, None] + samples[None, :]) / p  # [P,S] in [0,1)

    # [K,P,S] local offsets centered on the roi
    off_y = (frac[None] - 0.5) * rh[:, None, None]
    off_x = (frac[None] - 0.5) * rw[:, None, None]

    def one_roi(b, c_t, s_t, ox, oy, ccx, ccy):
        feat = features[b]
        # rotate local grid: [P,S,P,S]
        oy4 = oy[:, :, None, None]
        ox4 = ox[None, None, :, :]
        xs = ccx + ox4 * c_t - oy4 * s_t
        ys = ccy + ox4 * s_t + oy4 * c_t
        vals = _bilinear_gather(
            feat,
            jnp.broadcast_to(ys, (p, s, p, s)),
            jnp.broadcast_to(xs, (p, s, p, s)),
        )
        return jnp.mean(vals, axis=(2, 4))

    return jax.vmap(one_roi)(batch_idx, cos_t, sin_t, off_x, off_y, cx, cy)
