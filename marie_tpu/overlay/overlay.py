"""OverlayProcessor — document cleanup / form-overlay removal.

Behaviour parity with the reference (``/root/reference/marie/overlay/overlay.py:30``):
``segment_frame(key, frame)`` returns ``(real, mask, clean)`` — the
original, the detected overlay mask, and the cleaned page — and
``blend_to_text`` merges the cleaned page with dark-text pixels.  The
pix2pix generator runs in flax (tiled to the page bucket); blending is a
jitted elementwise graph instead of the reference's host HSV ops.
"""

from functools import partial
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.jaml import JAMLCompatible
from marie_tpu.logging_core import MarieLogger
from marie_tpu.models.configs import Pix2PixConfig
from marie_tpu.models.pix2pix import ResnetGenerator
from marie_tpu.preprocess import BucketSpec, pad_to


@partial(jax.jit, static_argnames=("model",))
def _segment_jit(model: ResnetGenerator, variables, page_u8: jnp.ndarray):
    """uint8 page -> (mask [H,W] float, clean uint8 [H,W,3])."""
    x = page_u8.astype(jnp.float32) / 127.5 - 1.0  # [-1, 1]
    fake = model.apply(variables, x[None])[0]  # [-1, 1]
    clean = jnp.clip((fake + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
    # overlay mask: where generator changed the page materially
    diff = jnp.abs(fake - x).mean(axis=-1)
    mask = (diff > 0.15).astype(jnp.float32)
    return mask, clean


@jax.jit
def _blend_to_text_jit(
    real_u8: jnp.ndarray, clean_u8: jnp.ndarray, overlay_mask: jnp.ndarray
):
    """Keep dark (text) pixels from the original page on the cleaned page
    (reference ``blend_to_text``'s HSV dark-range blend, :237) — EXCEPT
    pixels the generator flagged as overlay, else dark-gray form rules
    would ride back in through the dark-range keep."""
    real = real_u8.astype(jnp.float32)
    gray = real.mean(axis=-1)
    keep = ((gray < 128.0) & (overlay_mask < 0.5))[..., None]
    out = jnp.where(keep, real, clean_u8.astype(jnp.float32))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


class OverlayProcessor(JAMLCompatible):
    def __init__(
        self,
        work_dir: str = "/tmp/form-segmentation",
        config: Optional[Pix2PixConfig] = None,
        variables=None,
        bucket_spec: Optional[BucketSpec] = None,
        **kwargs,
    ):
        self.work_dir = work_dir
        self.logger = MarieLogger("OverlayProcessor")
        self.trained = variables is not None
        if variables is None and config is None:
            # default: the in-repo synthetic-trained generator
            # (scripts/train_overlay.py -> model_zoo/pix2pix-synth)
            from marie_tpu.registry.zoo import zoo_params

            variables = zoo_params("pix2pix-synth")
            if variables is not None:
                config = Pix2PixConfig.synth()
                self.trained = True
        self.config = config or Pix2PixConfig()
        self.model = ResnetGenerator(self.config)
        self.buckets = bucket_spec or BucketSpec()
        if variables is None:
            dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)
        self.variables = variables

    def segment_frame(
        self, key: str, frame: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Returns (real, mask, clean) at the original page size.

        Accepts 2-D grayscale frames (the serving engine's preferred
        layout) — the generator runs on a channel-stacked copy and the
        cleaned page returns in the caller's layout."""
        gray_in = frame.ndim == 2
        h, w = frame.shape[:2]
        (_, _), scale = self.buckets.fit_with_scale(h, w)
        work = np.stack([frame] * 3, axis=-1) if gray_in else frame
        if scale < 1.0:
            import cv2

            work = cv2.resize(
                work, (int(w * scale), int(h * scale)),
                interpolation=cv2.INTER_AREA,
            )
        # pad only to the generator's stride (4) — bucket-sized white
        # padding would shift the instance-norm statistics the resnet
        # generator normalizes over and wash out the cleanup
        wh, ww = work.shape[:2]
        bh = (wh + 7) // 8 * 8
        bw = (ww + 7) // 8 * 8
        padded = pad_to(work, bh, bw)
        mask_d, clean_d = _segment_jit(
            self.model, self.variables, jnp.asarray(padded)
        )
        blended_d = _blend_to_text_jit(jnp.asarray(padded), clean_d, mask_d)
        mask, blended = jax.device_get((mask_d, blended_d))
        hh, ww = work.shape[:2]
        mask = mask[:hh, :ww]
        blended = blended[:hh, :ww]
        if scale < 1.0:
            import cv2

            mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
            blended = cv2.resize(blended, (w, h), interpolation=cv2.INTER_LINEAR)
        if gray_in:
            blended = blended.mean(axis=-1)
        return frame, (mask * 255).astype(np.uint8), blended.astype(np.uint8)

    # interface parity with the reference's segment method naming
    def segment(self, document_id: str, frames) -> list:
        return [self.segment_frame(f"{document_id}_{i}", f) for i, f in enumerate(frames)]
