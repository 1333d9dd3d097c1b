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


@partial(jax.jit, static_argnames=("model", "compute_dtype", "gan_scale"))
def _segment_batch_gray_jit(
    model: ResnetGenerator,
    variables,
    pages_u8: jnp.ndarray,
    compute_dtype=jnp.float32,
    gan_scale: int = 1,
):
    """Batch-native overlay cleanup for grayscale pages.

    [P,H,W] uint8 -> (mask_u8 [P,H,W], blended_gray_u8 [P,H,W]) in ONE
    program: generator forward + mask + dark-text blend.  Replaces P
    sequential `segment_frame` round trips (upload, two dispatches and a
    ~7 MB device_get per page through the relay) with one upload and one
    download per chunk — the conv stack batches natively (the batching
    rule penalty only applies under vmap).  Matches `segment_frame` +
    `_blend_to_text_jit` semantics on 2-D input bit-for-bit except that
    the channel-mean of the blended page happens on device.
    """
    x = pages_u8.astype(jnp.float32) / 127.5 - 1.0  # [P,H,W] in [-1,1]
    x3 = jnp.repeat(x[..., None], 3, axis=-1)
    if compute_dtype == jnp.bfloat16:
        x3 = x3.astype(jnp.bfloat16)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32
            else a,
            variables,
        )
    if gan_scale > 1:
        # run the generator at reduced resolution (FLOPs / scale^2) and
        # upsample its output; the overlay structures the GAN removes
        # (form rules, boxes, stamps) are many pixels wide, so a
        # half-res forward loses no mask fidelity — the quality oracle's
        # overlay row (mask F1 + dirty-page CER delta) gates this
        p, hh, ww, _ = x3.shape
        small = jax.image.resize(
            x3, (p, hh // gan_scale, ww // gan_scale, 3), "linear"
        )
        fake_small = model.apply(variables, small)
        fake = jax.image.resize(
            fake_small, (p, hh, ww, 3), "linear"
        ).astype(jnp.float32)
    else:
        fake = model.apply(variables, x3).astype(jnp.float32)  # [P,H,W,3]
    clean_u8 = jnp.clip((fake + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
    diff = jnp.abs(fake - x.astype(jnp.float32)[..., None]).mean(axis=-1)
    mask = diff > 0.15
    real = pages_u8.astype(jnp.float32)
    keep = (real < 128.0) & ~mask
    blended3 = jnp.where(
        keep[..., None], real[..., None], clean_u8.astype(jnp.float32)
    )
    blended = jnp.clip(blended3.mean(axis=-1), 0, 255).astype(jnp.uint8)
    return mask.astype(jnp.uint8) * 255, blended


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
        # bf16 batch compute: halves the generator's matmul/conv time on
        # TPU; blended uint8 output measured bit-identical to f32 on the
        # synthetic eval (the 0.15 mask threshold sits far from bf16's
        # resolution at the diff magnitudes the GAN produces), and the
        # quality oracle's overlay CER-delta row gates it on real runs
        compute_dtype=jnp.bfloat16,
        # generator downscale factor for the batch path: 2 quarters the
        # GAN FLOPs by running the forward at half page resolution and
        # upsampling (mask + dark-text blend stay full-res); oracle-gated
        gan_scale: int = 2,
        **kwargs,
    ):
        self.work_dir = work_dir
        self.compute_dtype = compute_dtype
        self.gan_scale = int(gan_scale)
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
        # commit params to device ONCE — numpy leaves as jit args
        # re-upload through the relay on EVERY call (the r2 fused-path
        # lesson: load_params device-commit took the whole program
        # 99 -> 28 ms/page)
        self.variables = jax.device_put(variables)

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

    @staticmethod
    def overlay_scores(frames) -> list:
        """Cheap host-side dirtiness score per page: (colored_fraction,
        midtone_fraction) on a 4× subsample.  Form overlays are colored
        rules/boxes/stamps or gray shaded fills (train/overlay.py
        ``_OVERLAY_COLORS``); a clean printed page is near-black glyphs
        on near-white background with only antialiasing in between
        (~1% midtones), so the thresholds in :meth:`segment_batch`
        separate them with a wide margin.  Noisy/low-contrast scans score
        dirty and go through the GAN — the safe direction (slower,
        never worse)."""
        scores = []
        for f in frames:
            s = np.asarray(f)[::4, ::4]
            if s.ndim == 3:
                mx = s.max(axis=-1).astype(np.int16)
                mn = s.min(axis=-1).astype(np.int16)
                colored = float((mx - mn > 24).mean())
                gray = s.mean(axis=-1)
            else:
                colored = 0.0
                gray = s
            mid = float(((gray > 90) & (gray < 220)).mean())
            scores.append((colored, mid))
        return scores

    def segment_batch(
        self, frames, chunk: int = 4, compute_dtype=None, gate: str = "auto"
    ) -> list:
        """Clean a list of grayscale pages with batched device dispatch.

        Returns ``[clean_u8 [H,W], ...]`` matching
        ``[segment_frame(...)[2] for f in frames]``.  When every frame is
        the same 2-D shape the pages go through
        ``_segment_batch_gray_jit`` in ``chunk``-page groups — one upload
        and one download per group instead of per page (the per-page path
        measured 278 ms/page through the relay; the batch path is
        device-bound).  Mixed shapes / RGB input fall back per frame.

        ``gate="auto"`` (default; ``MARIE_OVERLAY_GATE=off`` disables)
        skips the GAN for pages with no overlay signature
        (:meth:`overlay_scores`) — a clean page's dark-text blend is its
        own text on white, so passing it through unchanged is
        OCR-equivalent (the oracle's dirty-page CER-delta row runs the
        gate and gates regressions).
        """
        import os

        same_2d = frames and all(
            f.ndim == 2 and f.shape == frames[0].shape for f in frames
        )
        if not same_2d:
            return [
                self.segment_frame(f"b{i}", f)[2] for i, f in enumerate(frames)
            ]
        if gate == "auto" and os.environ.get("MARIE_OVERLAY_GATE") != "off":
            flags = [
                colored > 0.001 or mid > 0.03
                for colored, mid in self.overlay_scores(frames)
            ]
            if not all(flags):
                out = [np.asarray(f) for f in frames]
                dirty_idx = [i for i, d in enumerate(flags) if d]
                if dirty_idx:
                    cleaned = self.segment_batch(
                        [frames[i] for i in dirty_idx], chunk=chunk,
                        compute_dtype=compute_dtype, gate="off",
                    )
                    for i, c in zip(dirty_idx, cleaned):
                        out[i] = c
                return out
        h, w = frames[0].shape
        (_, _), scale = self.buckets.fit_with_scale(h, w)
        work = list(frames)
        if scale < 1.0:
            import cv2

            work = [
                cv2.resize(
                    f, (int(w * scale), int(h * scale)),
                    interpolation=cv2.INTER_AREA,
                )
                for f in work
            ]
        wh, ww = work[0].shape
        bh, bw = (wh + 7) // 8 * 8, (ww + 7) // 8 * 8
        batch = np.zeros((len(work), bh, bw), np.uint8)
        batch[:, :wh, :ww] = np.stack(work)
        batch[:, wh:, :] = 255  # white padding, as pad_to does
        batch[:, :, ww:] = 255
        dtype = compute_dtype or self.compute_dtype
        # dispatch every chunk before collecting any: jit dispatch is
        # async, so chunk i+1's upload+forward runs behind chunk i's
        # device_get instead of strictly after it (the serial loop
        # measured transfer-bound at ~45 ms/page)
        handles = []
        for s in range(0, len(work), chunk):
            part = batch[s : s + chunk]
            if part.shape[0] != chunk:  # pad the tail group to one shape
                pad = np.full((chunk - part.shape[0], bh, bw), 255, np.uint8)
                part = np.concatenate([part, pad])
            _, blended_d = _segment_batch_gray_jit(
                self.model, self.variables, jnp.asarray(part),
                compute_dtype=dtype, gan_scale=self.gan_scale,
            )
            handles.append(blended_d)
        outs = [jax.device_get(h) for h in handles]
        blended = np.concatenate(outs)[: len(work), :wh, :ww]
        if scale < 1.0:
            import cv2

            blended = np.stack(
                [
                    cv2.resize(b, (w, h), interpolation=cv2.INTER_LINEAR)
                    for b in blended
                ]
            )
        return [b for b in blended]

    # interface parity with the reference's segment method naming
    def segment(self, document_id: str, frames) -> list:
        return [self.segment_frame(f"{document_id}_{i}", f) for i, f in enumerate(frames)]
