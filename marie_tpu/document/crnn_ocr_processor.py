"""CRNN/CTC recognizer processor (the reference's CraftOcrProcessor uses
the four-stage CRNN — ``/root/reference/marie/document/craft_ocr_processor.py:26``).

Fragments resize to 32×W grayscale, width-bucketed; the CTC collapse runs
on device (:func:`marie_tpu.ops.ctc_greedy_decode`).
"""

from functools import partial
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.models.configs import CRNNConfig
from marie_tpu.models.crnn import CRNN
from marie_tpu.models.tokenizer import CTCCharTokenizer
from marie_tpu.ops import ctc_greedy_decode
from marie_tpu.preprocess.buckets import group_by_bucket, pad_batch
from marie_tpu.preprocess.ops import crop_resize_pages


@partial(jax.jit, static_argnames=("model", "out_h", "out_w"))
def _crop_and_ctc(model, variables, page_u8, boxes_xyxy, out_h, out_w):
    """ONE program: cut word crops from the on-device page, grayscale
    (channel mean — matches ``train/crnn.py``), CRNN forward, CTC
    collapse.  Device-path analog of TrOCR's ``_crop_and_decode``."""
    crops, _ = crop_resize_pages(
        page_u8[None], jnp.zeros((boxes_xyxy.shape[0],), jnp.int32),
        boxes_xyxy, out_h, out_w,
    )
    if crops.ndim == 3:  # grayscale page — crops already single-channel
        gray = crops[..., None]
    else:
        gray = crops.mean(axis=-1, keepdims=True)
    logits = model.apply(variables, gray)
    return ctc_greedy_decode(logits, blank_id=0)


class CrnnOcrProcessor(OcrProcessor):
    def __init__(
        self,
        work_dir: str = "/tmp/icr",
        config: Optional[CRNNConfig] = None,
        variables=None,
        tokenizer: Optional[CTCCharTokenizer] = None,
        width_buckets: Sequence[int] = (64, 128, 256),
        batch_sizes: Sequence[int] = (8, 32, 128),
        **kwargs,
    ):
        super().__init__(work_dir, **kwargs)
        self.config = config or CRNNConfig()
        self.model = CRNN(self.config)
        self.tokenizer = tokenizer or CTCCharTokenizer()
        self.width_buckets = tuple(width_buckets)
        self.batch_sizes = tuple(batch_sizes)
        self.crop_h = self.config.input_height
        if variables is None:
            dummy = jnp.zeros((1, self.crop_h, self.width_buckets[0], 1), jnp.float32)
            variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), dummy)
        # device_put once — numpy leaves as jit args re-upload per call
        self.variables = jax.device_put(variables)
        self._fwd = jax.jit(lambda v, x: self.model.apply(v, x))

    # ------------------------------------------------------------------
    # device path: crops cut on device from the detector's uploaded page
    # (same dispatch/collect protocol as TrOcrProcessor — the voting
    # engine drives every recogniser through it)
    def recognize_from_page(self, page_dev, boxes_xywh, scale: float = 1.0):
        return self.recognize_collect(
            self.recognize_dispatch(page_dev, boxes_xywh, scale)
        )

    def recognize_dispatch(self, page_dev, boxes_xywh, scale: float = 1.0):
        n = len(boxes_xywh)
        if n == 0:
            return []
        xyxy = np.asarray(boxes_xywh, np.float32) * scale
        xyxy = np.stack(
            [xyxy[:, 0], xyxy[:, 1], xyxy[:, 0] + xyxy[:, 2], xyxy[:, 1] + xyxy[:, 3]],
            axis=-1,
        )
        out_w = self.width_buckets[-1]
        max_bs = self.batch_sizes[-1]
        futures = []
        for start in range(0, n, max_bs):
            chunk = xyxy[start : start + max_bs]
            bs = pad_batch(len(chunk), self.batch_sizes)
            padded = np.zeros((bs, 4), np.float32)
            padded[:, 2:] = 1.0
            padded[: len(chunk)] = chunk
            toks, lens, conf = _crop_and_ctc(
                self.model, self.variables, page_dev, jnp.asarray(padded),
                self.crop_h, out_w,
            )
            futures.append((len(chunk), toks, lens, conf))
        return futures

    def recognize_collect(self, futures) -> List[Dict[str, Any]]:
        return self.recognize_collect_many([futures])[0]

    def recognize_collect_many(self, futures_lists) -> List[List[Dict[str, Any]]]:
        flat = [f for fl in futures_lists for f in fl]
        if not flat:
            return [[] for _ in futures_lists]
        toks = jnp.concatenate([t for (_, t, _, _) in flat], axis=0)
        lens = jnp.concatenate([l for (_, _, l, _) in flat], axis=0)
        confs = jnp.concatenate([c for (_, _, _, c) in flat], axis=0)
        tokens, lengths, conf = jax.device_get((toks, lens, confs))

        out_all: List[List[Dict[str, Any]]] = []
        row = 0
        for fl in futures_lists:
            page_out: List[Dict[str, Any]] = []
            for n_chunk, tok_dev, _, _ in fl:
                bs = tok_dev.shape[0]
                for r in range(n_chunk):
                    ids = tokens[row + r, : lengths[row + r]]
                    page_out.append(
                        {
                            "text": self.tokenizer.decode(ids),
                            "confidence": float(conf[row + r]),
                        }
                    )
                row += bs
            out_all.append(page_out)
        return out_all

    def _prep(self, frag: np.ndarray) -> np.ndarray:
        import cv2

        if frag.ndim == 3:
            frag = cv2.cvtColor(frag, cv2.COLOR_RGB2GRAY)
        fh, fw = frag.shape[:2]
        if fh == 0 or fw == 0:
            return np.full((self.crop_h, 1), 1.0, np.float32)
        scale = self.crop_h / fh
        new_w = max(1, min(int(round(fw * scale)), self.width_buckets[-1]))
        resized = cv2.resize(frag, (new_w, self.crop_h))
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
        preps = [self._prep(f) for f in fragments]
        widths = [p.shape[1] for p in preps]
        groups = group_by_bucket(widths, self.width_buckets)

        out: List[Optional[Dict[str, Any]]] = [None] * n
        max_bs = self.batch_sizes[-1]
        for bucket_w, indices in groups.items():
            for chunk_start in range(0, len(indices), max_bs):
                chunk = indices[chunk_start : chunk_start + max_bs]
                bs = pad_batch(len(chunk), self.batch_sizes)
                batch = np.full((bs, self.crop_h, bucket_w, 1), 1.0, np.float32)
                for row, idx in enumerate(chunk):
                    p = preps[idx]
                    batch[row, :, : p.shape[1], 0] = p
                logits = self._fwd(self.variables, jnp.asarray(batch))
                tokens, lengths, conf = ctc_greedy_decode(logits, blank_id=0)
                tokens = np.asarray(tokens)
                lengths = np.asarray(lengths)
                conf = np.asarray(conf)
                for row, idx in enumerate(chunk):
                    ids = tokens[row, : lengths[row]]
                    out[idx] = {
                        "text": self.tokenizer.decode(ids),
                        "confidence": float(conf[row]),
                    }
        return [o if o is not None else {"text": "", "confidence": 0.0} for o in out]
