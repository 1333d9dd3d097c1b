"""InkBoxProcessor — weight-free on-device word detection.

Classical pipeline entirely on TPU: Otsu binarise → horizontal
morphological closing (joins characters into words) → connected
components → component boxes.  Serves as (a) a deterministic fallback /
dry-run detector (the reference ships ``MockOcrEngine`` + CPU paths for
the same purpose) and (b) the detection oracle for end-to-end tests,
where neural detectors would need trained weights.
"""

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.boxes.box_processor import BoxProcessor
from marie_tpu.ops import component_boxes, component_boxes_runs_cc, connected_components
from marie_tpu.preprocess import BucketSpec, pad_to
from marie_tpu.preprocess.ops import normalize_page, otsu_binarize, to_grayscale


@partial(jax.jit, static_argnames=("join_x", "join_y", "max_components"))
def _ink_detect_jit(
    page_u8: jnp.ndarray, join_x: int, join_y: int, max_components: int
):
    rgb = normalize_page(page_u8)
    ink = otsu_binarize(to_grayscale(rgb))
    # morphological closing: dilate then erode with a (join_y, join_x) window
    def _maxpool(m, wy, wx):
        return jax.lax.reduce_window(
            m.astype(jnp.float32), -jnp.inf, jax.lax.max,
            (wy, wx), (1, 1), "SAME",
        ) > 0

    if join_x > 1 or join_y > 1:
        dil = _maxpool(ink, join_y, join_x)
        joined = ~_maxpool(~dil, join_y, join_x)  # closing ⊇ ink
    else:
        joined = ink
    # run-domain CC+stats (round 5): identical outputs, no pixel label
    # grid; closed ink words sit far under the 64-run row budget
    stats = component_boxes_runs_cc(
        joined, ink.astype(jnp.float32), max_components,
        max_runs_per_row=64,
    )
    return stats


class InkBoxProcessor(BoxProcessor):
    def __init__(
        self,
        work_dir: str = "/tmp/boxes",
        join_x: int = 9,
        join_y: int = 1,
        min_area: int = 8,
        max_components: int = 1024,
        bucket_spec: Optional[BucketSpec] = None,
        **kwargs,
    ):
        super().__init__(work_dir, **kwargs)
        self.join_x = join_x
        self.join_y = join_y
        self.min_area = min_area
        self.max_components = max_components
        self.buckets = bucket_spec or BucketSpec()

    def detect_words(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        boxes, scores, _, _ = self.detect_with_page(image)
        return boxes, scores

    def detect_with_page(self, image: np.ndarray):
        """Like :meth:`BoxProcessorCraft.detect_with_page`: returns
        (boxes, scores, page_u8_device, scale) for fused recognition."""
        h, w = image.shape[:2]
        (bh, bw), scale = self.buckets.fit_with_scale(h, w)
        if scale < 1.0:
            import cv2

            image = cv2.resize(
                image, (int(w * scale), int(h * scale)), interpolation=cv2.INTER_AREA
            )
        padded = pad_to(image, bh, bw)
        page_dev = jnp.asarray(padded)
        stats = _ink_detect_jit(
            page_dev, self.join_x, self.join_y, self.max_components
        )
        boxes = np.asarray(stats["boxes"]) / scale
        areas = np.asarray(stats["areas"])
        valid = np.asarray(stats["valid"])
        keep = valid & (areas >= self.min_area)
        boxes = boxes[keep]
        xywh = np.stack(
            [
                boxes[:, 0],
                boxes[:, 1],
                boxes[:, 2] - boxes[:, 0],
                boxes[:, 3] - boxes[:, 1],
            ],
            axis=-1,
        )
        inside = (xywh[:, 0] < w) & (xywh[:, 1] < h)
        xywh = xywh[inside]
        xywh[:, 2] = np.minimum(xywh[:, 2], w - xywh[:, 0])
        xywh[:, 3] = np.minimum(xywh[:, 3], h - xywh[:, 1])
        scores = np.ones((len(xywh),), np.float32)
        return xywh, scores, page_dev, scale
