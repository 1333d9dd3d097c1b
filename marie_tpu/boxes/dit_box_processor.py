"""DiT-style box processor — ViT backbone + FCN heatmap head.

Counterpart of the reference's default detector ``BoxProcessorUlimDit``
(``/root/reference/marie/boxes/dit/ulim_dit_box_processor.py:356`` — DiT
BEiT backbone + detectron2 Mask R-CNN).  TPU re-design: rather than a
two-stage Mask R-CNN (proposal loops are hostile to static-shape XLA),
the ViT feature grid feeds a dense per-pixel text-region head (the
DBNet/CRAFT formulation) and reuses the same fused on-device
threshold→CC→box-stats post-processing as the CRAFT path — one compiled
program per page bucket.  The PSMode semantics (including the sparse
two-pass behaviour) come from the shared BoxProcessor base.
"""

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.boxes.box_processor import BoxProcessor
from marie_tpu.models.configs import ViTConfig
from marie_tpu.models.vit import ViTEncoder
from marie_tpu.ops import component_boxes, component_boxes_runs_cc, connected_components
from marie_tpu.preprocess import BucketSpec, pad_to
from marie_tpu.preprocess.ops import normalize_page


class DiTDetector(nn.Module):
    """ViT encoder + upsampling FCN head -> text-region heatmap at /4."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        grid = ViTEncoder(self.cfg, name="backbone").feature_grid(images)
        # upsample patch grid (stride 16) to cfg.head_stride*subpixel
        # with conv-resize stages, halving channels per octave; the 1x1
        # head then predicts subpixel^2 phase maps per output channel and
        # depth-to-spaces to the cfg.head_stride output grid (sub-pixel
        # head — the fix that took the TextFuseNet stride-4 head from
        # recall 0.723 to 0.995, models/textfusenet.py)
        x = grid
        sub = self.cfg.subpixel
        n_up = 0
        s = self.cfg.patch_size
        while s > self.cfg.head_stride * sub:
            s //= 2
            n_up += 1
        for i in range(n_up):
            ch = max(self.cfg.hidden_dim >> (i + 1), 32)
            b, h, w, _ = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, x.shape[-1]), "bilinear")
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"up{i}")(x)
            x = nn.relu(x)
        out = nn.Conv(2 * sub * sub, (1, 1), name="head")(x)
        if sub > 1:
            b, hh, ww, _ = out.shape
            out = out.reshape(b, hh, ww, sub, sub, 2)
            out = out.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, hh * sub, ww * sub, 2
            )
        return nn.sigmoid(out)  # region + affinity


@partial(jax.jit, static_argnames=("model", "max_components"))
def _dit_detect_jit(model, variables, page_u8, text_threshold, low_text,
                    max_components):
    rgb = normalize_page(page_u8)
    heat = model.apply(variables, rgb[None])[0]
    region = heat[..., 0]
    # region-only CC (round 5): the region target is the whole shrunk
    # word box; affinity bands only eat the component budget (see
    # craft_box_processor._detect_core)
    mask = region > low_text
    # run-domain CC+stats (round 5): output-identical to
    # connected_components + component_boxes (parity-pinned) without the
    # pixel label grid; word masks hold well under the 64-run row budget
    return component_boxes_runs_cc(
        mask, region, max_components=max_components, max_runs_per_row=64
    )


class BoxProcessorUlimDit(BoxProcessor):
    """DiT-style detector with the shared box pipeline."""

    def __init__(
        self,
        work_dir: str = "/tmp/boxes",
        models_dir: str = "",
        config: Optional[ViTConfig] = None,
        variables=None,
        text_threshold: float = 0.7,
        low_text: float = 0.8,
        min_area: int = 4,
        max_components: int = 1024,
        bucket_spec: Optional[BucketSpec] = None,
        unshrink: bool = True,
        **kwargs,
    ):
        super().__init__(work_dir, models_dir, **kwargs)
        if variables is None and config is None:
            # default: the in-repo synthetic-trained DiT checkpoints
            # (scripts/train_dit.py), preferring the sub-pixel phase
            # head (stride-1 output grid = page-pixel stride 2 under the
            # 2x downscale serve — the classic head's stride-4 cells
            # capped oracle IoU at 0.685)
            from marie_tpu.registry.zoo import zoo_params

            for name, cfg_fn in (
                ("dit-s1-synth", ViTConfig.dit_synth_s1),
                ("dit-synth", ViTConfig.dit_synth),
            ):
                variables = zoo_params(name)
                if variables is not None:
                    config = cfg_fn()
                    break
        self.config = config or ViTConfig(
            image_size=(1024, 768), patch_size=16, hidden_dim=384,
            num_layers=6, num_heads=6, mlp_dim=1536, use_cls_token=False,
        )
        self.model = DiTDetector(self.config)
        # low_text default 0.8 (vs CRAFT's 0.4): a held-out sweep was
        # monotone 0.4->0.85 (recall 0.706 -> 0.973) — the ViT heatmap is
        # soft at word EDGES, so a low threshold merges neighbours into
        # one component; 0.8 peaks recall*precision with the best IoU
        self.text_threshold = text_threshold
        self.low_text = low_text
        self.unshrink = unshrink
        self.min_area = min_area
        self.max_components = max_components
        self.buckets = bucket_spec or BucketSpec(
            shapes=(tuple(self.config.image_size),)
        )
        if variables is None:
            h, w = self.config.image_size
            dummy = jnp.zeros((1, h, w, 3), jnp.float32)
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)
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
            _dit_detect_jit(
                self.model, self.variables, jnp.asarray(padded),
                self.text_threshold, self.low_text, self.max_components,
            )
        )
        keep = (
            stats["valid"]
            & (stats["scores"] >= self.text_threshold)
            & (stats["areas"] >= self.min_area)
        )
        boxes = stats["boxes"][keep] * float(self.config.head_stride) / scale
        if self.unshrink and len(boxes):
            # undo the training-target shrink (train/craft.py: ~10% per
            # side horizontal, ~5% vertical) plus the threshold erosion,
            # so returned boxes match the UNSHRUNK word extent the
            # recognizer crops expect.  The constants are head-dependent:
            # the stride-4/2 classic head erodes ~half a cell per side on
            # top of the shrink (bw/8+1, bh/18+1); the sub-pixel stride-1
            # head has no cell erosion and its vertical extent already
            # matches truth — a held-out sweep (tuning seed 7, disjoint
            # from the oracle's) peaked at ex=bw/16+0.5, ey=0
            # (IoU 0.667 -> 0.822 at unchanged recall)
            bw_ = boxes[:, 2] - boxes[:, 0]
            bh_ = boxes[:, 3] - boxes[:, 1]
            if self.config.subpixel > 1:
                ex = bw_ / 16.0 + 0.5
                ey = np.zeros_like(bh_)
            else:
                ex = bw_ / 8.0 + 1.0
                ey = bh_ / 18.0 + 1.0
            boxes = np.stack(
                [boxes[:, 0] - ex, boxes[:, 1] - ey,
                 boxes[:, 2] + ex, boxes[:, 3] + ey], axis=-1,
            )
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
        return xywh[ok], stats["scores"][keep][ok]
