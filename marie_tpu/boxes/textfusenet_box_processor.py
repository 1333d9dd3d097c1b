"""TextFuseNet box processor — multi-level fusion detection in ONE program.

Counterpart of the reference's TextFuseNet detector (vendored detectron2
fork under ``/root/reference/marie/models/textfusenet/`` — Mask R-CNN
with a seg-head global context and a per-instance multi-path fuse
module).  The TPU program: FPN dense forward -> word-heatmap
connected-components -> static top-K word candidates -> char-heatmap CC
-> top-M char candidates -> vectorised multi-path fusion (word ROI +
contained-char mean + global-context ROI) -> refined per-word score and
box.  No proposal loops, no dynamic instance lists — the whole page
compiles to one XLA program per bucket.
"""

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.boxes.box_processor import BoxProcessor
from marie_tpu.models.textfusenet import TextFuseNet, TextFuseNetConfig
from marie_tpu.ops import component_boxes, component_boxes_runs_cc, connected_components
from marie_tpu.preprocess import BucketSpec, pad_to
from marie_tpu.preprocess.ops import normalize_page


@partial(jax.jit, static_argnames=("model",))
def _tfn_detect_jit(model, variables, page_u8, word_threshold, low_text,
                    char_threshold):
    cfg = model.cfg
    rgb = normalize_page(page_u8)
    out = model.apply(variables, rgb[None])
    word_region = out["word"][0, ..., 0]
    char_map = out["char"][0, ..., 0]

    # word candidates: region CC (CRAFT post-processing shape).
    # Maps are at cfg.head_stride; the fuse module pools stride-4 P3
    # features, so component boxes convert to stride-4 units before
    # fusion (to_p3 = head_stride/4; 1.0 for the classic head).
    to_p3 = cfg.head_stride / 4.0
    # region-only CC (round 5): the word-region target is the whole
    # shrunk word box, so affinity adds only inter-word band components
    # that eat the max_words budget (see craft_box_processor._detect_core)
    wmask = word_region > low_text
    # run-domain CC+stats for the word mask (round 5, parity-pinned);
    # the char map keeps the pixel path — dense char rows can exceed a
    # practical per-row run budget
    wstats = component_boxes_runs_cc(
        wmask, word_region, max_components=cfg.max_words,
        max_runs_per_row=64,
    )
    # char candidates
    cstats = component_boxes(
        connected_components(char_map > char_threshold), char_map,
        max_components=cfg.max_chars,
    )
    word_valid = wstats["valid"] & (wstats["scores"] >= word_threshold)
    score, refined = model.apply(
        variables,
        out["p3"][0],
        out["seg_feat"][0],
        wstats["boxes"].astype(jnp.float32) * to_p3,
        word_valid,
        cstats["boxes"].astype(jnp.float32) * to_p3,
        cstats["valid"],
        method=TextFuseNet.fuse,
    )
    return {
        "boxes": refined,                   # [K,4] xyxy stride-4 grid
        "heat_boxes": wstats["boxes"] * to_p3,  # [K,4] pre-refinement (/4)
        "scores": score,                    # [K] fused text/noise score
        "heat_scores": wstats["scores"],
        # areas in stride-4 cells so min_area keeps its meaning
        "areas": wstats["areas"] * (to_p3 * to_p3),
        "valid": word_valid,
        "char_boxes": cstats["boxes"],
        "char_valid": cstats["valid"],
        "seg": jax.nn.sigmoid(out["seg_logits"][0, ..., 0]),
    }


class BoxProcessorTextFuseNet(BoxProcessor):
    """Multi-branch fusion detector with the shared box pipeline."""

    def __init__(
        self,
        work_dir: str = "/tmp/boxes",
        models_dir: str = "",
        config: Optional[TextFuseNetConfig] = None,
        variables=None,
        word_threshold: float = 0.6,
        # held-out sweep on the stride-2 checkpoint: recall/precision flat
        # 0.993-0.997 / 0.997-1.000 across lt 0.2-0.8, peak at 0.6 (the
        # stride-4 checkpoint needed 0.8 to reach only 0.829 — the d2s
        # head removed the sensitivity along with the word merging)
        low_text: float = 0.6,
        char_threshold: float = 0.5,
        fuse_threshold: float = 0.5,
        min_area: int = 4,
        page_hw: Tuple[int, int] = (1024, 768),
        bucket_spec: Optional[BucketSpec] = None,
        **kwargs,
    ):
        super().__init__(work_dir, models_dir, **kwargs)
        if variables is None and config is None:
            # default ladder: stride-2 sub-pixel-head checkpoint when
            # trained (small-font inter-word gaps quantize below one
            # stride-4 cell and merge), else the classic stride-4 slot
            # (scripts/train_textfusenet.py -> model_zoo/textfusenet-*)
            from marie_tpu.registry.zoo import zoo_params

            for name, cfg_fn in (
                ("textfusenet-s2-synth", TextFuseNetConfig.synth_s2),
                ("textfusenet-synth", TextFuseNetConfig.synth),
            ):
                variables = zoo_params(name)
                if variables is not None:
                    config = cfg_fn()
                    break
        self.config = config or TextFuseNetConfig.synth()
        self.model = TextFuseNet(self.config)
        self.word_threshold = word_threshold
        self.low_text = low_text
        self.char_threshold = char_threshold
        self.fuse_threshold = fuse_threshold
        self.min_area = min_area
        self.buckets = bucket_spec or BucketSpec(shapes=(tuple(page_hw),))
        if variables is None:
            h, w = page_hw
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            variables = jax.jit(
                self.model.init,
                static_argnames=("method",),
            )(jax.random.PRNGKey(0), dummy, method="init_probe")
        # device_put once — numpy leaves as jit args re-upload per call
        self.variables = jax.device_put(variables)

    def detect_words(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        h, w = image.shape[:2]
        (bh, bw), scale = self.buckets.fit_with_scale(h, w)
        if scale < 1.0:
            import cv2

            image = cv2.resize(
                image, (int(w * scale), int(h * scale)),
                interpolation=cv2.INTER_AREA,
            )
        padded = pad_to(image, bh, bw)
        stats = jax.device_get(
            _tfn_detect_jit(
                self.model, self.variables, jnp.asarray(padded),
                self.word_threshold, self.low_text, self.char_threshold,
            )
        )
        keep = (
            stats["valid"]
            & (stats["scores"] >= self.fuse_threshold)
            & (stats["areas"] >= self.min_area)
        )
        boxes = stats["boxes"][keep] * 4.0 / scale  # head stride 4
        scores = (
            stats["scores"][keep] * stats["heat_scores"][keep]
        ) ** 0.5  # geometric mean of heatmap + fused confidence
        xywh = np.stack(
            [
                np.clip(boxes[:, 0], 0, w),
                np.clip(boxes[:, 1], 0, h),
                np.clip(boxes[:, 2], 0, w) - np.clip(boxes[:, 0], 0, w),
                np.clip(boxes[:, 3], 0, h) - np.clip(boxes[:, 1], 0, h),
            ],
            axis=-1,
        )
        ok = (xywh[:, 2] > 0) & (xywh[:, 3] > 0)
        return xywh[ok], scores[ok]
