"""Aspect-preserving letterbox resize (reference
``marie/utils/resize_image.py:9`` — returns the padded image plus the
``(x, y, w, h)`` placement of the original content so downstream boxes
can be mapped back; ``resize_image_progressive:79`` shrinks in steps,
which preserves thin strokes better than one big INTER_AREA hop)."""

from typing import Sequence, Tuple

import numpy as np


def _resize(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(img, (hw[1], hw[0]), interpolation=cv2.INTER_CUBIC)
    except ImportError:
        from PIL import Image

        mode = Image.fromarray(img)
        return np.asarray(mode.resize((hw[1], hw[0]), Image.BICUBIC))


def resize_image(
    image: np.ndarray,
    desired_size: Tuple[int, int],
    color: Sequence[int] = (255, 255, 255),
) -> Tuple[np.ndarray, Tuple[int, int, int, int]]:
    """Fit ``image`` into ``desired_size`` (h, w) without distortion:
    downscale by the limiting ratio when too large, then center-pad with
    ``color``.  Returns ``(padded, (x, y, w, h))`` where the tuple is the
    content placement inside the padded canvas."""
    dh, dw = desired_size
    h, w = image.shape[:2]
    if (h, w) == (dh, dw):
        return image, (0, 0, w, h)
    if h > dh or w > dw:
        ratio = min(dh / h, dw / w)
        h, w = max(1, int(h * ratio)), max(1, int(w * ratio))
        image = _resize(image, (h, w))
    top = (dh - h) // 2
    left = (dw - w) // 2
    if image.ndim == 2:
        canvas = np.full((dh, dw), color[0], dtype=image.dtype)
    else:
        canvas = np.full((dh, dw, image.shape[2]),
                         np.asarray(color[: image.shape[2]], image.dtype),
                         dtype=image.dtype)
    canvas[top:top + h, left:left + w] = image
    return canvas, (left, top, w, h)


def resize_image_progressive(
    image: np.ndarray,
    reduction_percent: float,
    reductions: int = 2,
    return_intermediate_states: bool = False,
):
    """Shrink by ``reduction_percent`` total over ``reductions`` equal
    steps (progressive downscale keeps glyph strokes readable)."""
    if image is None:
        raise ValueError("input image can't be empty")
    h, w = image.shape[:2]
    target = (max(1, h - int(h * reduction_percent)),
              max(1, w - int(w * reduction_percent)))
    steps = []
    cur = image
    for i in range(1, reductions + 1):
        f = i / reductions
        hw = (max(1, int(h - (h - target[0]) * f)),
              max(1, int(w - (w - target[1]) * f)))
        cur = _resize(cur, hw)
        steps.append(cur)
    if return_intermediate_states:
        return cur, steps
    return cur
