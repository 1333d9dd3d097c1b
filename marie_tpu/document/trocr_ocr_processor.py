"""TrOCR recognizer processor — bucketed batched decode on TPU.

Behaviour parity with the reference's ``TrOcrProcessor``
(``/root/reference/marie/document/trocr_ocr_processor.py:188`` — batched
beam-5 fairseq decode over word crops).  TPU re-design: fragments are
resized to a fixed height, grouped into **width buckets** and padded to
**fixed batch sizes**, so every batch hits one of a handful of compiled
programs; decode is the scan-based greedy/beam of
:mod:`marie_tpu.models.trocr` — the whole bucket decodes in one XLA
program with zero host round-trips.
"""

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from functools import partial

from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.models.configs import TrOCRConfig
from marie_tpu.models.tokenizer import CharTokenizer
from marie_tpu.models.trocr import TrOCRModel, beam_decode, greedy_decode
from marie_tpu.preprocess.buckets import group_by_bucket, pad_batch
from marie_tpu.preprocess.ops import crop_resize_pages


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def _crop_batch_on_device(page_u8: jnp.ndarray, boxes_xyxy: jnp.ndarray,
                          out_h: int, out_w: int) -> jnp.ndarray:
    """uint8 page (already on device) + boxes -> float crop batch, on device."""
    crops, _ = crop_resize_pages(
        page_u8[None], jnp.zeros((boxes_xyxy.shape[0],), jnp.int32),
        boxes_xyxy, out_h, out_w,
    )
    if crops.ndim == 3:  # grayscale page -> expand crop channels
        crops = jnp.repeat(crops[..., None], 3, axis=-1)
    return crops


@partial(jax.jit, static_argnames=("model", "out_h", "out_w", "beam_size", "dtype", "max_steps"))
def _crop_and_decode(model, params, page_u8, boxes_xyxy, out_h, out_w,
                     beam_size: int = 1, dtype=jnp.float32,
                     max_steps: int | None = None):
    """ONE program: cut crops from the on-device page and decode them —
    a single dispatch per chunk instead of crop + decode round trips.
    Crops gather straight from the uint8 page via the layout-aware
    :func:`crop_resize_pages` (no f32 page materialisation, no
    lane-padded trailing-channel gathers)."""
    crops, _ = crop_resize_pages(
        page_u8[None], jnp.zeros((boxes_xyxy.shape[0],), jnp.int32),
        boxes_xyxy, out_h, out_w,
    )
    if crops.ndim == 3:  # grayscale page -> expand crop channels
        crops = jnp.repeat(crops[..., None], 3, axis=-1)
    crops = crops.astype(dtype)
    if beam_size > 1:
        tokens, lengths, conf = beam_decode(model, params, crops, beam_size)
    else:
        tokens, lengths, conf = greedy_decode(model, params, crops, max_steps)
    return tokens, conf


class TrOcrProcessor(OcrProcessor):
    def __init__(
        self,
        work_dir: str = "/tmp/icr",
        config: Optional[TrOCRConfig] = None,
        params=None,
        tokenizer: Optional[CharTokenizer] = None,
        beam_size: int = 1,
        batch_sizes: Sequence[int] = (8, 32, 128),
        width_buckets: Optional[Sequence[int]] = None,
        param_dtype: str = "float32",
        decode_steps: Optional[int] = None,
        **kwargs,
    ):
        super().__init__(work_dir, **kwargs)
        self.config = config or TrOCRConfig.fast()
        self.model = TrOCRModel(self.config)
        self.tokenizer = tokenizer or CharTokenizer()
        self.beam_size = beam_size
        self.batch_sizes = tuple(batch_sizes)
        self.decode_steps = decode_steps
        h, w = self.config.encoder.image_size
        self.crop_h, self.crop_w = h, w
        # width buckets never exceed the encoder's input width
        wb = width_buckets or [w // 4, w // 2, (3 * w) // 4, w]
        self.width_buckets = tuple(sorted({min(b, w) for b in wb}))
        if self.decode_steps is None:
            # crops are stretched to full height; a glyph is ~0.5*h wide,
            # so the width bound caps the character count
            max_chars = max(w // max(h // 2, 1), 4)
            self.decode_steps = min(max_chars + 4, self.config.decoder.max_len)
        if params is None:
            dummy_img = jnp.zeros((1, h, w, 3), jnp.float32)
            dummy_tok = jnp.zeros((1, 2), jnp.int32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy_img, dummy_tok)
        self.compute_dtype = jnp.bfloat16 if param_dtype == "bfloat16" else jnp.float32
        if param_dtype == "bfloat16":
            from marie_tpu.utils.dtype import cast_floats

            params = cast_floats(params, jnp.bfloat16)
        # device_put once — numpy leaves as jit args re-upload per call
        self.params = jax.device_put(params)

    def warmup(self, page_hw=None, batch_sizes=None) -> None:
        """Pre-compile the decode program for every configured batch size so
        serving never pays a JIT compile mid-request (shape discipline:
        SURVEY.md §7 hard-part #1).  With ``page_hw`` the fused
        crop+decode program is compiled for that page bucket too.

        ``batch_sizes`` restricts warmup to a subset — on relay-attached
        devices each cached executable still pays a multi-second backend
        LOAD, so warming rarely-used overflow buckets costs real
        cold-start time (the cache-hit analysis in ARCHITECTURE.md)."""
        for bs in batch_sizes or self.batch_sizes:
            if page_hw is not None:
                page = jnp.zeros((*page_hw, 3), jnp.uint8)
                boxes = jnp.tile(
                    jnp.asarray([[0.0, 0.0, 8.0, 8.0]], jnp.float32), (bs, 1)
                )
                out = _crop_and_decode(
                    self.model, self.params, page, boxes,
                    self.crop_h, self.crop_w, self.beam_size,
                    self.compute_dtype, self.decode_steps,
                )
            else:
                imgs = jnp.zeros((bs, self.crop_h, self.crop_w, 3), jnp.float32)
                if self.beam_size > 1:
                    out = beam_decode(
                        self.model, self.params, imgs, beam_size=self.beam_size
                    )
                else:
                    out = greedy_decode(self.model, self.params, imgs)
            jax.block_until_ready(out)

    # ------------------------------------------------------------------
    def recognize_from_page(
        self,
        page_dev,  # jnp.uint8 [H, W, 3] — already on device (from detection)
        boxes_xywh: np.ndarray,  # [N, 4] original-image coords
        scale: float = 1.0,  # original -> padded-page scale
    ) -> List[Dict[str, Any]]:
        """Fused recognition: crops are cut ON DEVICE from the page the
        detector already uploaded — per page only the tiny box array goes
        up and the token ids come back (no crop pixels on the wire)."""
        return self.recognize_collect(
            self.recognize_dispatch(page_dev, boxes_xywh, scale)
        )

    def recognize_dispatch(self, page_dev, boxes_xywh, scale: float = 1.0):
        """Launch fused crop+decode for all chunks WITHOUT waiting."""
        n = len(boxes_xywh)
        if n == 0:
            return []
        xyxy = np.asarray(boxes_xywh, np.float32) * scale
        xyxy = np.stack(
            [xyxy[:, 0], xyxy[:, 1], xyxy[:, 0] + xyxy[:, 2], xyxy[:, 1] + xyxy[:, 3]],
            axis=-1,
        )
        max_bs = self.batch_sizes[-1]
        futures = []
        for start in range(0, n, max_bs):
            chunk = xyxy[start : start + max_bs]
            bs = pad_batch(len(chunk), self.batch_sizes)
            padded = np.zeros((bs, 4), np.float32)
            padded[:, 2:] = 1.0  # dummy 1×1 boxes for pad rows
            padded[: len(chunk)] = chunk
            tok_dev, conf_dev = _crop_and_decode(
                self.model, self.params, page_dev, jnp.asarray(padded),
                self.crop_h, self.crop_w, self.beam_size, self.compute_dtype,
                self.decode_steps,
            )
            futures.append((len(chunk), tok_dev, conf_dev))
        return futures

    def recognize_collect(self, futures) -> List[Dict[str, Any]]:
        return self.recognize_collect_many([futures])[0]

    def recognize_collect_many(self, futures_lists) -> List[List[Dict[str, Any]]]:
        """Collect MANY pages' dispatched chunks with ONE device→host
        transfer: token/conf arrays are concatenated on device first, so
        a 16-page batch pays a single round trip instead of ~50."""
        flat = [f for fl in futures_lists for f in fl]
        if not flat:
            return [[] for _ in futures_lists]
        toks = jnp.concatenate([t for (_, t, _) in flat], axis=0)
        confs = jnp.concatenate([c for (_, _, c) in flat], axis=0)
        tokens, conf = jax.device_get((toks, confs))

        out_all: List[List[Dict[str, Any]]] = []
        row = 0
        for fl in futures_lists:
            page_out: List[Dict[str, Any]] = []
            for n_chunk, tok_dev, _ in fl:
                bs = tok_dev.shape[0]
                for r in range(n_chunk):
                    page_out.append(
                        {
                            "text": self.tokenizer.decode(tokens[row + r]),
                            "confidence": float(conf[row + r]),
                        }
                    )
                row += bs
            out_all.append(page_out)
        return out_all

    # ------------------------------------------------------------------
    def _prep_fragment(self, frag: np.ndarray) -> np.ndarray:
        """uint8 fragment -> float32 [crop_h, eff_w<=crop_w, 3] in [0,1]."""
        import cv2

        if frag.ndim == 2:
            frag = np.stack([frag] * 3, -1)
        fh, fw = frag.shape[:2]
        if fh == 0 or fw == 0:
            return np.full((self.crop_h, 1, 3), 1.0, np.float32)
        scale = self.crop_h / fh
        new_w = max(1, min(int(round(fw * scale)), self.crop_w))
        resized = cv2.resize(
            frag, (new_w, self.crop_h), interpolation=cv2.INTER_LINEAR
        )
        out = resized.astype(np.float32)
        if out.max() > 1.5:
            out = out / 255.0
        return out

    def recognize_from_fragments(
        self, fragments: Sequence[np.ndarray]
    ) -> List[Dict[str, Any]]:
        n = len(fragments)
        if n == 0:
            return []
        preps = [self._prep_fragment(f) for f in fragments]
        widths = [p.shape[1] for p in preps]
        groups = group_by_bucket(widths, self.width_buckets)

        out: List[Optional[Dict[str, Any]]] = [None] * n
        max_bs = self.batch_sizes[-1]
        for bucket_w, indices in groups.items():
            # NOTE: the encoder is compiled for its full input width; width
            # bucketing pads the *content*, the tensor is always crop_w wide.
            # (Smaller-width encoder variants are a later optimisation.)
            # Large fragment sets are CHUNKED at the largest compiled batch
            # size — never a fresh shape, however many pages are batched.
            for chunk_start in range(0, len(indices), max_bs):
                chunk = indices[chunk_start : chunk_start + max_bs]
                bs = pad_batch(len(chunk), self.batch_sizes)
                batch = np.full(
                    (bs, self.crop_h, self.crop_w, 3), 1.0, np.float32
                )
                for row, idx in enumerate(chunk):
                    p = preps[idx]
                    batch[row, :, : p.shape[1]] = p

                imgs = jnp.asarray(batch, self.compute_dtype)
                if self.beam_size > 1:
                    tokens, lengths, conf = beam_decode(
                        self.model, self.params, imgs, beam_size=self.beam_size
                    )
                else:
                    tokens, lengths, conf = greedy_decode(
                        self.model, self.params, imgs, self.decode_steps
                    )
                tokens = np.asarray(tokens)
                conf = np.asarray(conf)
                for row, idx in enumerate(chunk):
                    out[idx] = {
                        "text": self.tokenizer.decode(tokens[row]),
                        "confidence": float(conf[row]),
                    }
        return [o if o is not None else {"text": "", "confidence": 0.0} for o in out]
