"""Jitted page/crop preprocessing ops.

The reference preprocesses on host with OpenCV/PIL
(``/root/reference/marie/utils/image_utils.py``, ``resize_image.py``);
here the per-page graph (grayscale → normalize → binarize) runs on device
and word crops are cut with a single batched bilinear-sampling op
(:func:`crop_resize`) instead of N host-side ``img[y:y+h, x:x+w]`` slices —
so a page's pixels are uploaded once and never leave HBM until text
comes out.
"""

from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.jit
def to_grayscale(img: Array) -> Array:
    """[H, W, 3] -> [H, W] luma."""
    w = jnp.array([0.299, 0.587, 0.114], img.dtype)
    return img @ w


@jax.jit
def normalize_page(img: Array) -> Array:
    """uint8 [H, W, C] -> float32 in [0, 1]."""
    return img.astype(jnp.float32) / 255.0


@jax.jit
def otsu_binarize(gray: Array) -> Array:
    """Otsu thresholding on device. gray float [H, W] in [0,1] -> bool mask
    of INK pixels (True = dark).

    The histogram is built by sort + searchsorted instead of scatter-add:
    a scatter with ~1M colliding indices serialises on TPU (observed
    minutes-long stalls through the runtime), while sort is a fast
    built-in and 256 searchsorted probes are trivial.
    """
    nbins = 256
    flat = jnp.clip((gray * (nbins - 1)).astype(jnp.int32), 0, nbins - 1)
    sorted_vals = jnp.sort(flat.reshape(-1))
    # boundaries[i] = first index with value >= i  →  hist by differencing
    boundaries = jnp.searchsorted(sorted_vals, jnp.arange(nbins + 1))
    hist = jnp.diff(boundaries).astype(jnp.float32)
    total = jnp.sum(hist)
    bins = jnp.arange(nbins, dtype=jnp.float32)

    w0 = jnp.cumsum(hist)
    w1 = total - w0
    sum_all = jnp.sum(hist * bins)
    sum0 = jnp.cumsum(hist * bins)
    mu0 = sum0 / jnp.maximum(w0, 1.0)
    mu1 = (sum_all - sum0) / jnp.maximum(w1, 1.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    t = jnp.argmax(between).astype(jnp.float32) / (nbins - 1)
    return gray <= t


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_resize(
    image: Array,  # [H, W, C] float
    boxes: Array,  # [N, 4] xyxy float (page coords)
    out_h: int,
    out_w: int,
    preserve_aspect: bool = True,
):
    """Cut N boxes out of a page and resize each to (out_h, out_w).

    Aspect-preserving: each crop is scaled so its height fits ``out_h``;
    the width scales by the same factor and is right-padded with white.
    Returns (crops [N, out_h, out_w, C], eff_w [N] effective widths).
    """
    h, w = image.shape[0], image.shape[1]
    x0, y0, x1, y1 = (boxes[:, i] for i in range(4))
    bh = jnp.maximum(y1 - y0, 1.0)
    bw = jnp.maximum(x1 - x0, 1.0)

    if preserve_aspect:
        scale = out_h / bh
        eff_w = jnp.minimum(jnp.round(bw * scale), out_w)
    else:
        eff_w = jnp.full_like(bw, out_w)

    # sample grid per crop: ys over [y0, y1), xs over [x0, x0 + out_w/scale)
    ys_frac = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h  # [out_h]
    xs_idx = jnp.arange(out_w, dtype=jnp.float32) + 0.5  # [out_w]

    def one(b_x0, b_y0, b_bh, b_bw, b_eff):
        # SEPARABLE bilinear: axis-aligned crops sample on a rank-1 grid
        # (sy varies only by row, sx only by column), so instead of one
        # 2-D gather of out_h*out_w single pixels (pathologically slow on
        # TPU) we gather 2*out_h FULL ROWS, blend along y, then gather
        # 2*out_w columns and blend along x — bit-identical values,
        # ~100x less gather work (measured 5.2s -> see bench breakdown).
        sy = jnp.clip(b_y0 + ys_frac * b_bh - 0.5, 0.0, h - 1.0)  # [out_h]
        # x step widens when the aspect-preserved width would overflow
        # out_w: the word SQUEEZES to fit instead of truncating its tail
        # (the recognizer trains on squeezed renders — a truncated crop
        # loses glyphs outright: mono 'statement' read as 'statemen')
        step = jnp.maximum(b_bh / out_h, b_bw / out_w)
        sx = jnp.clip(b_x0 + xs_idx * step - 0.5, 0.0, w - 1.0)  # [out_w]

        y0i = jnp.floor(sy).astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, h - 1)
        ly = (sy - y0i)[:, None, None]
        rows = (
            image[y0i] * (1.0 - ly) + image[y1i] * ly
        )  # [out_h, W, C]

        x0i = jnp.floor(sx).astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, w - 1)
        lx = (sx - x0i)[None, :, None]
        vals = rows[:, x0i] * (1.0 - lx) + rows[:, x1i] * lx

        pad_mask = (jnp.arange(out_w)[None, :] >= b_eff)[..., None]
        return jnp.where(pad_mask, 1.0, vals)

    crops = jax.vmap(one)(x0, y0, bh, bw, eff_w)
    return crops, eff_w.astype(jnp.int32)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_resize_pages(
    pages: Array,  # [P, H, W] or [P, H, W, C] uint8 (or float 0..255)
    page_idx: Array,  # [N] int32 — which page each box crops from
    boxes: Array,  # [N, 4] xyxy float (page coords)
    out_h: int,
    out_w: int,
):
    """Cut N boxes out of a stack of pages, resize each to (out_h, out_w).

    Cross-page variant of :func:`crop_resize` for the globally-compacted
    fused OCR batch (``ocr/fused.py``): boxes from different pages are
    gathered into ONE crop batch, so the recogniser only encodes slots
    that hold real detections.

    LAYOUT-CRITICAL: TPU tiles the two minor dims to (8, 128) lanes, so
    an array whose trailing dim is C=1 or C=3 is padded 128/C× in memory
    — gathers against it read 42-128× the useful bytes (a measured 10×
    on the crop stage).  The gathers here therefore run against a
    channel-FREE [P, H, W] view (grayscale) or a channel-INTERLEAVED
    [P, H, W·C] view (RGB, column index = x·C + c), and the uint8 rows
    convert to float only after the gather.

    Returns (crops [N, out_h, out_w] for 3-D input / [N, out_h, out_w, C]
    for 4-D input, float32 in [0, 1], white-padded past each crop's
    aspect-preserved effective width, eff_w [N] int32).
    """
    h, w = pages.shape[1], pages.shape[2]
    chans = None
    if pages.ndim == 4:
        chans = pages.shape[3]
        if chans == 1:
            pages = pages[..., 0]
        else:
            pages = pages.reshape(pages.shape[0], h, w * chans)
    x0, y0, x1, y1 = (boxes[:, i] for i in range(4))
    bh = jnp.maximum(y1 - y0, 1.0)
    bw = jnp.maximum(x1 - x0, 1.0)
    scale = out_h / bh
    eff_w = jnp.minimum(jnp.round(bw * scale), out_w)

    ys_frac = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xs_idx = jnp.arange(out_w, dtype=jnp.float32) + 0.5
    interleaved = chans is not None and chans > 1

    def one(pidx, b_x0, b_y0, b_bh, b_bw, b_eff):
        sy = jnp.clip(b_y0 + ys_frac * b_bh - 0.5, 0.0, h - 1.0)
        # squeeze-on-overflow (see crop_resize): wide words compress to
        # out_w instead of losing their tail past the encoder width
        step = jnp.maximum(b_bh / out_h, b_bw / out_w)
        sx = jnp.clip(b_x0 + xs_idx * step - 0.5, 0.0, w - 1.0)

        y0i = jnp.floor(sy).astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, h - 1)
        ly = (sy - y0i)[:, None].astype(jnp.float32)
        r0 = pages[pidx, y0i].astype(jnp.float32)  # [out_h, W(·C)]
        r1 = pages[pidx, y1i].astype(jnp.float32)
        rows = r0 * (1.0 - ly) + r1 * ly

        x0i = jnp.floor(sx).astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, w - 1)
        lx = (sx - x0i).astype(jnp.float32)
        if interleaved:
            # column gather picks all C interleaved samples per x index
            cc = jnp.arange(chans)[None, :]
            g0 = rows[:, (x0i[:, None] * chans + cc).reshape(-1)]
            g1 = rows[:, (x1i[:, None] * chans + cc).reshape(-1)]
            g0 = g0.reshape(out_h, out_w, chans)
            g1 = g1.reshape(out_h, out_w, chans)
            vals = g0 * (1.0 - lx)[None, :, None] + g1 * lx[None, :, None]
            pad_mask = (jnp.arange(out_w)[None, :] >= b_eff)[..., None]
        else:
            vals = rows[:, x0i] * (1.0 - lx)[None, :] + rows[:, x1i] * lx[None, :]
            pad_mask = jnp.arange(out_w)[None, :] >= b_eff
        return jnp.where(pad_mask, 255.0, vals)

    crops = jax.vmap(one)(page_idx.astype(jnp.int32), x0, y0, bh, bw, eff_w)
    if chans == 1:
        crops = crops[..., None]
    return crops / 255.0, eff_w.astype(jnp.int32)


def _bilinear_hwc(img: Array, ys: Array, xs: Array) -> Array:
    """Bilinear sample [H, W, C] at float coords; clamps at borders."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (ys - y0)[..., None]
    lx = (xs - x0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - ly) * (1 - lx)
        + v01 * (1 - ly) * lx
        + v10 * ly * (1 - lx)
        + v11 * ly * lx
    )


@partial(jax.jit, static_argnames=("target_h", "target_w"))
def resize_page(image: Array, target_h: int, target_w: int) -> Array:
    """Bilinear resize [H, W, C] -> [target_h, target_w, C]."""
    return jax.image.resize(
        image, (target_h, target_w, image.shape[2]), method="bilinear"
    )


@partial(jax.jit, static_argnames=("bucket_h", "bucket_w"))
def prepare_page(
    img_u8: Array, bucket_h: int, bucket_w: int, scale: float = 1.0
):
    """Fused page-prep graph: uint8 page (already padded on host to the
    bucket) -> dict of device tensors used by the pipeline stages.

    Returns {'rgb': [H,W,3] f32 0..1, 'gray': [H,W], 'ink': [H,W] bool}.
    """
    rgb = normalize_page(img_u8)
    gray = to_grayscale(rgb)
    ink = otsu_binarize(gray)
    return {"rgb": rgb, "gray": gray, "ink": ink}
