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

from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.models.configs import TrOCRConfig
from marie_tpu.models.tokenizer import CharTokenizer
from marie_tpu.models.trocr import TrOCRModel, beam_decode, greedy_decode
from marie_tpu.preprocess.buckets import group_by_bucket, pad_batch


class TrOcrProcessor(OcrProcessor):
    def __init__(
        self,
        work_dir: str = "/tmp/icr",
        config: Optional[TrOCRConfig] = None,
        params=None,
        tokenizer: Optional[CharTokenizer] = None,
        beam_size: int = 1,
        batch_sizes: Sequence[int] = (8, 16, 32, 64, 128),
        width_buckets: Optional[Sequence[int]] = None,
        **kwargs,
    ):
        super().__init__(work_dir, **kwargs)
        self.config = config or TrOCRConfig.fast()
        self.model = TrOCRModel(self.config)
        self.tokenizer = tokenizer or CharTokenizer()
        self.beam_size = beam_size
        self.batch_sizes = tuple(batch_sizes)
        h, w = self.config.encoder.image_size
        self.crop_h, self.crop_w = h, w
        # width buckets never exceed the encoder's input width
        wb = width_buckets or [w // 4, w // 2, (3 * w) // 4, w]
        self.width_buckets = tuple(sorted({min(b, w) for b in wb}))
        if params is None:
            dummy_img = jnp.zeros((1, h, w, 3), jnp.float32)
            dummy_tok = jnp.zeros((1, 2), jnp.int32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy_img, dummy_tok)
        self.params = params

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
        for bucket_w, indices in groups.items():
            # NOTE: the encoder is compiled for its full input width; width
            # bucketing pads the *content*, the tensor is always crop_w wide.
            # (Smaller-width encoder variants are a later optimisation.)
            bs = pad_batch(len(indices), self.batch_sizes)
            batch = np.full((bs, self.crop_h, self.crop_w, 3), 1.0, np.float32)
            for row, idx in enumerate(indices):
                p = preps[idx]
                batch[row, :, : p.shape[1]] = p

            imgs = jnp.asarray(batch)
            if self.beam_size > 1:
                tokens, lengths, conf = beam_decode(
                    self.model, self.params, imgs, beam_size=self.beam_size
                )
            else:
                tokens, lengths, conf = greedy_decode(self.model, self.params, imgs)
            tokens = np.asarray(tokens)
            conf = np.asarray(conf)
            for row, idx in enumerate(indices):
                out[idx] = {
                    "text": self.tokenizer.decode(tokens[row]),
                    "confidence": float(conf[row]),
                }
        return [o if o is not None else {"text": "", "confidence": 0.0} for o in out]
