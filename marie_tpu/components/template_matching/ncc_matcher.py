"""Normalised cross-correlation template matcher — MXU-friendly.

Equivalent capability to the reference's DIM/VQNNF matchers
(``/root/reference/marie/components/template_matching/dim_template_matching.py``,
``vqnnf_template_matching.py``) for the rigid-template case: matching is
ONE convolution over the page (the template is the kernel — exactly the
shape of compute the MXU eats), with local statistics from box-filter
convs giving exact NCC, then on-device NMS over peak candidates.
"""

from functools import partial
from typing import List, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.components.template_matching.base import (
    BaseTemplateMatcher,
    TemplateMatchResult,
)
from marie_tpu.ops import nms


@partial(jax.jit, static_argnames=("th", "tw", "max_peaks"))
def _ncc_jit(page_gray: jnp.ndarray, template_gray: jnp.ndarray, th: int, tw: int,
             max_peaks: int):
    """Exact NCC map + top-K peaks.  page [H,W] f32, template [th,tw] f32."""
    t = template_gray - template_gray.mean()
    t_norm = jnp.sqrt(jnp.sum(t * t) + 1e-6)

    img = page_gray[None, :, :, None]  # NHWC
    kern = t[:, :, None, None]  # HWIO

    corr = jax.lax.conv_general_dilated(
        img, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]

    ones = jnp.ones((th, tw, 1, 1), jnp.float32)
    s1 = jax.lax.conv_general_dilated(
        img, ones, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )[0, :, :, 0]
    s2 = jax.lax.conv_general_dilated(
        (page_gray * page_gray)[None, :, :, None], ones, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    n = th * tw
    local_var = jnp.maximum(s2 - s1 * s1 / n, 1e-6)
    ncc = corr / (jnp.sqrt(local_var) * t_norm)

    flat = ncc.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_peaks)
    w_out = ncc.shape[1]
    ys = (idx // w_out).astype(jnp.float32)
    xs = (idx % w_out).astype(jnp.float32)
    boxes = jnp.stack([xs, ys, xs + tw, ys + th], axis=-1)
    keep, _ = nms(boxes, scores, iou_threshold=0.3)
    return boxes, scores, keep


class NCCTemplateMatcher(BaseTemplateMatcher):
    def __init__(self, max_peaks: int = 32, **kwargs):
        super().__init__(**kwargs)
        self.max_peaks = max_peaks

    def match(
        self,
        frames: Sequence[np.ndarray],
        score_threshold: float = 0.8,
        max_matches_per_template: int = 5,
    ) -> List[TemplateMatchResult]:
        out: List[TemplateMatchResult] = []
        for fi, frame in enumerate(frames):
            gray = np.asarray(frame, np.float32)
            if gray.ndim == 3:
                gray = gray.mean(axis=-1)
            gray = gray / 255.0 if gray.max() > 1.5 else gray
            for tpl in self._templates:
                timg = np.asarray(tpl["image"], np.float32)
                if timg.ndim == 3:
                    timg = timg.mean(axis=-1)
                timg = timg / 255.0 if timg.max() > 1.5 else timg
                th, tw = timg.shape
                if th > gray.shape[0] or tw > gray.shape[1]:
                    continue
                boxes, scores, keep = jax.device_get(
                    _ncc_jit(
                        jnp.asarray(gray), jnp.asarray(timg), th, tw,
                        self.max_peaks,
                    )
                )
                picked = 0
                for box, score, k in zip(boxes, scores, keep):
                    if not k or score < score_threshold:
                        continue
                    if picked >= max_matches_per_template:
                        break
                    x0, y0, x1, y1 = box
                    out.append(
                        TemplateMatchResult(
                            bbox=[int(x0), int(y0), int(x1 - x0), int(y1 - y0)],
                            label=tpl["label"],
                            score=float(score),
                            similarity=float(score),
                            frame_index=fi,
                        )
                    )
                    picked += 1
        return out
