"""Document classifier over the LayoutLMv3-style encoder.

Capability parity with the reference's ``TransformersDocumentClassifier``
(``/root/reference/marie/components/document_classifier/transformers.py:33``
— text+layout(+image) sequence classification, batch_size 16, fp16).
TPU re-design: fixed ``max_seq_len`` padding with a length mask, one
compiled program for any page; batches padded to fixed sizes.
"""

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.components.base import BaseDocumentClassifier, PageInput
from marie_tpu.components.word_tokenizer import HashWordTokenizer
from marie_tpu.models.configs import LayoutLMConfig
from marie_tpu.models.layoutlm import LayoutLMv3ForSequenceClassification
from marie_tpu.preprocess.buckets import pad_batch


SYNTH_CLASS_LABELS = ("invoice", "correspondence", "claim")


class LayoutDocumentClassifier(BaseDocumentClassifier):
    @classmethod
    def from_zoo(cls, name: str = "layout-classifier-synth",
                 labels=SYNTH_CLASS_LABELS) -> "LayoutDocumentClassifier | None":
        """Load the in-repo synthetic-trained classifier if present."""
        import os

        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        ckpt = os.path.join(repo, "model_zoo", name)
        if not os.path.isdir(ckpt):
            return None
        from marie_tpu.registry.checkpoints import load_params

        return cls(
            labels=labels,
            config=LayoutLMConfig.synth(num_labels=len(labels)),
            params=load_params(ckpt),
        )

    @classmethod
    def from_zoo_chain(cls, name: str = "layout-classifier-chain",
                       labels=SYNTH_CLASS_LABELS):
        """The on-device-chain head (scripts/train_chain_heads.py):
        RollingWordTokenizer ids, shuffled-order training, seq cap 192."""
        import dataclasses
        import os

        from marie_tpu.components.word_tokenizer import RollingWordTokenizer

        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        ckpt = os.path.join(repo, "model_zoo", name)
        if not os.path.isdir(ckpt):
            return None
        from marie_tpu.registry.checkpoints import load_params

        config = dataclasses.replace(
            LayoutLMConfig.synth(num_labels=len(labels)), max_seq_len=192
        )
        return cls(
            labels=labels,
            config=config,
            params=load_params(ckpt),
            tokenizer=RollingWordTokenizer(config.vocab_size),
        )

    def __init__(
        self,
        labels: Sequence[str] = ("negative", "positive"),
        config: Optional[LayoutLMConfig] = None,
        params=None,
        tokenizer: Optional[HashWordTokenizer] = None,
        batch_sizes: Sequence[int] = (4, 8, 16, 32),
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.labels = list(labels)
        self.config = config or LayoutLMConfig.base(num_labels=len(self.labels))
        if self.config.num_labels != len(self.labels):
            raise ValueError("config.num_labels must match labels")
        self.model = LayoutLMv3ForSequenceClassification(self.config)
        self.tokenizer = tokenizer or HashWordTokenizer(self.config.vocab_size)
        self.batch_sizes = tuple(batch_sizes)
        self.use_image = self.config.use_image
        if params is None:
            l = self.config.max_seq_len
            dummy_img = (
                jnp.zeros((1, *self.config.image_size, 3), jnp.float32)
                if self.use_image
                else None
            )
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, l), jnp.int32),
                jnp.zeros((1, l, 4), jnp.int32),
                jnp.ones((1,), jnp.int32),
                dummy_img,
            )
        self.params = params
        self._fwd = jax.jit(
            lambda p, t, b, s, im: self.model.apply(p, t, b, s, im)
        )

    def _encode_batch(self, pages: Sequence[PageInput]):
        l = self.config.max_seq_len
        bs = pad_batch(len(pages), self.batch_sizes)
        tokens = np.zeros((bs, l), np.int32)
        boxes = np.zeros((bs, l, 4), np.int32)
        seq_len = np.ones((bs,), np.int32)
        images = None
        if self.use_image:
            ih, iw = self.config.image_size
            images = np.full((bs, ih, iw, 3), 1.0, np.float32)
        for i, page in enumerate(pages):
            t, b, n = self.tokenizer.encode_page(
                page.words, page.boxes, page.page_size, l, self.config.max_2d_pos
            )
            tokens[i], boxes[i], seq_len[i] = t, b, max(n, 1)
            if self.use_image and page.image is not None:
                import cv2

                ih, iw = self.config.image_size
                img = cv2.resize(page.image, (iw, ih)).astype(np.float32) / 255.0
                if img.ndim == 2:
                    img = np.stack([img] * 3, -1)
                images[i] = img
        return tokens, boxes, seq_len, images

    def predict(self, pages: Sequence[PageInput]) -> List[Dict[str, Any]]:
        if not pages:
            return []
        tokens, boxes, seq_len, images = self._encode_batch(pages)
        logits = self._fwd(
            self.params,
            jnp.asarray(tokens),
            jnp.asarray(boxes),
            jnp.asarray(seq_len),
            jnp.asarray(images) if images is not None else None,
        )
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[: len(pages)]
        out = []
        for row in probs:
            idx = int(np.argmax(row))
            out.append(
                {
                    "label": self.labels[idx],
                    "score": float(row[idx]),
                    "scores": {lb: float(p) for lb, p in zip(self.labels, row)},
                }
            )
        return out
