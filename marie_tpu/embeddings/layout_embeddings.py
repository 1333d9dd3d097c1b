"""Self-contained text/document embeddings over the LayoutLM encoder.

Capability parity with the reference's ``TransformersEmbeddings``
(``/root/reference/marie/embeddings/transformers/transformers_embeddings.py:16``);
no pretrained assets exist in this environment, so the default model is
the in-repo LayoutLMv3-style encoder with the hash-word tokenizer
(mean-pooled final states, L2-normalised).  HF-backed embeddings can be
slotted behind the same ``EmbeddingsBase`` API when vocab files exist.
"""

from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.components.word_tokenizer import HashWordTokenizer
from marie_tpu.embeddings.base import EmbeddingsBase
from marie_tpu.models.configs import LayoutLMConfig
from marie_tpu.models.layoutlm import LayoutLMv3Encoder
from marie_tpu.preprocess.buckets import pad_batch


class LayoutEmbeddingsModel(EmbeddingsBase):
    def __init__(
        self,
        config: Optional[LayoutLMConfig] = None,
        params=None,
        batch_sizes: Sequence[int] = (4, 16, 64),
        **kwargs,
    ):
        super().__init__(**kwargs)
        cfg = config or LayoutLMConfig.base()
        # text-only embedding: no image branch
        import dataclasses

        self.config = dataclasses.replace(cfg, use_image=False)
        self.model = LayoutLMv3Encoder(self.config)
        self.tokenizer = HashWordTokenizer(self.config.vocab_size)
        self.batch_sizes = tuple(batch_sizes)
        if params is None:
            l = self.config.max_seq_len
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, l), jnp.int32),
                jnp.zeros((1, l, 4), jnp.int32),
                jnp.ones((1,), jnp.int32),
                None,
            )
        self.params = params
        self._fwd = jax.jit(
            lambda p, t, b, s: self.model.apply(p, t, b, s, None)
        )

    def get_embeddings(self, texts: Sequence[str], **kwargs) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.config.hidden_dim), np.float32)
        l = self.config.max_seq_len
        bs = pad_batch(len(texts), self.batch_sizes)
        tokens = np.zeros((bs, l), np.int32)
        boxes = np.zeros((bs, l, 4), np.int32)
        seq_len = np.ones((bs,), np.int32)
        for i, text in enumerate(texts):
            words = text.split()[:l] or [""]
            for j, wd in enumerate(words):
                tokens[i, j] = self.tokenizer.token_id(wd)
            seq_len[i] = max(len(words), 1)
        states = self._fwd(
            self.params, jnp.asarray(tokens), jnp.asarray(boxes),
            jnp.asarray(seq_len),
        )
        states = np.asarray(states)[: len(texts)]
        mask = (np.arange(l)[None, :] < seq_len[: len(texts), None])[..., None]
        pooled = (states * mask).sum(1) / np.maximum(mask.sum(1), 1)
        norm = np.linalg.norm(pooled, axis=-1, keepdims=True)
        return (pooled / np.maximum(norm, 1e-8)).astype(np.float32)
