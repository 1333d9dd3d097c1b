"""Learned reading-order model — TPU-native LayoutReader analog.

Capability parity with the reference's LayoutReader integration
(``/root/reference/marie/document/layoutreader/text_layout.py:33`` —
``TextLayout.forward(words, boxes) -> list[int]`` re-orders word boxes
with a layout-only seq2seq BERT, ``layoutlm_only_layout_flag=True``,
decoding up to 511 steps autoregressively).

TPU re-design: reading order is a *ranking* problem, so instead of a
511-step seq2seq decode we score every box with a continuous "reading
rank" in ONE transformer-encoder forward pass and ``argsort`` the
scores.  Static shapes (boxes padded to a bucket), no per-step host
round trips, the whole page batch orders in a single XLA program — and
like the reference's layout-only flag, only geometry is used, so no
tokenizer is needed at all.
"""

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from marie_tpu.models.layers import EncoderLayer

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ReadingOrderConfig:
    hidden_dim: int = 128
    num_layers: int = 4
    num_heads: int = 4
    mlp_dim: int = 256
    max_boxes: int = 256  # sequence bucket (pages with more are chunked)

    @staticmethod
    def base() -> "ReadingOrderConfig":
        return ReadingOrderConfig()

    @staticmethod
    def tiny() -> "ReadingOrderConfig":
        return ReadingOrderConfig(hidden_dim=32, num_layers=2, num_heads=2, mlp_dim=64)


def box_features(boxes: Array) -> Array:
    """xyxy boxes normalised to [0, 1] -> geometry feature vector [..., 8].

    Features: x0, y0, x1, y1, cx, cy, w, h — all the signal the ranking
    head needs; richer than raw corners so column/row structure is
    linearly separable early in the stack.
    """
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    cx = (x0 + x1) * 0.5
    cy = (y0 + y1) * 0.5
    w = x1 - x0
    h = y1 - y0
    return jnp.stack([x0, y0, x1, y1, cx, cy, w, h], axis=-1)


class ReadingOrderModel(nn.Module):
    """Transformer encoder over box geometry -> scalar reading rank per box."""

    cfg: ReadingOrderConfig

    def setup(self):
        c = self.cfg
        self.embed = nn.Dense(c.hidden_dim)
        self.layers = [
            EncoderLayer(c.num_heads, c.hidden_dim, c.mlp_dim, name=f"layer_{i}")
            for i in range(c.num_layers)
        ]
        self.ln_f = nn.LayerNorm()
        self.head = nn.Dense(1)

    def __call__(self, boxes: Array, n_valid: Optional[Array] = None) -> Array:
        """[B, N, 4] xyxy in [0,1] (+ per-page valid count) -> scores [B, N].

        Lower score = earlier in reading order.  Padded rows (index >=
        ``n_valid``) are masked out of attention; their scores are
        meaningless and must be dropped by the caller.
        """
        x = self.embed(box_features(boxes))
        for layer in self.layers:
            x = layer(x, kv_len=n_valid)
        return self.head(self.ln_f(x))[..., 0]


@partial(jax.jit, static_argnames=("model",))
def _score_boxes(model: ReadingOrderModel, params, boxes: Array, n_valid: Array) -> Array:
    return model.apply(params, boxes, n_valid)


class TextLayout:
    """Drop-in parity class for the reference's ``TextLayout``
    (``text_layout.py:33``): ``forward(words, boxes) -> list[int]``.

    ``boxes`` are xyxy in layoutlm [0, 1000] coordinates (same contract
    as the reference).  ``words`` are accepted for interface parity but
    unused — like the reference's ``layoutlm_only_layout_flag``, ordering
    is geometry-only.
    """

    def __init__(self, config: Optional[ReadingOrderConfig] = None, params=None):
        self.cfg = config or ReadingOrderConfig.base()
        self.model = ReadingOrderModel(self.cfg)
        if params is None:
            dummy = jnp.zeros((1, self.cfg.max_boxes, 4), jnp.float32)
            params = jax.jit(self.model.init)(
                jax.random.PRNGKey(0), dummy, jnp.ones((1,), jnp.int32)
            )
        self.params = params

    def __call__(self, *args, **kwargs):
        return self.reconstruct(*args, **kwargs)

    def forward(
        self, words: Sequence[str], boxes: Sequence[Sequence[float]]
    ) -> List[int]:
        assert len(words) == len(boxes)
        return self.order(boxes)

    def order(self, boxes: Sequence[Sequence[float]], scale: float = 1000.0) -> List[int]:
        """xyxy boxes (in [0, ``scale``] coords) -> reading-order index list.

        Pages longer than ``max_boxes`` are ordered in vertical bands:
        boxes are pre-sorted by y, chunked at the bucket size, each chunk
        model-ordered — bands this tall read independently in practice and
        the shapes stay static.
        """
        n = len(boxes)
        if n == 0:
            return []
        arr = np.asarray(boxes, np.float32) / float(scale)
        nb = self.cfg.max_boxes
        if n <= nb:
            chunks = [(np.arange(n), arr)]
        else:
            ys = arr[:, 1]
            pre = np.argsort(ys, kind="stable")
            chunks = [
                (pre[s : s + nb], arr[pre[s : s + nb]])
                for s in range(0, n, nb)
            ]
        out: List[int] = []
        for idx, sub in chunks:
            k = len(sub)
            padded = np.zeros((nb, 4), np.float32)
            padded[:k] = sub
            scores = np.asarray(
                _score_boxes(
                    self.model,
                    self.params,
                    jnp.asarray(padded)[None],
                    jnp.asarray([k], jnp.int32),
                )
            )[0, :k]
            out.extend(int(idx[i]) for i in np.argsort(scores, kind="stable"))
        return out

    def reconstruct(self, words: Sequence[str], boxes: Sequence[Sequence[float]]):
        """Reference-parity convenience: returns (ordered_words, ordered_boxes)."""
        order = self.forward(words, boxes)
        return [words[i] for i in order], [boxes[i] for i in order]
