"""Document indexer (NER / KV extraction) over LayoutLM token classification.

Capability parity with the reference's ``TransformersDocumentIndexer``
(``/root/reference/marie/components/document_indexer/transformers.py:91`` —
512-token windows with stride-128 sliding window at :510-527, BIO entity
aggregation).  The window stack is static per page length bucket; window
logits are overlap-averaged before BIO decoding.
"""

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from marie_tpu.components.base import BaseDocumentIndexer, PageInput
from marie_tpu.components.word_tokenizer import HashWordTokenizer
from marie_tpu.models.configs import LayoutLMConfig
from marie_tpu.models.layoutlm import (
    LayoutLMv3ForTokenClassification,
    merge_window_logits,
    sliding_windows,
)


SYNTH_NER_LABELS = ("O", "B-KEY", "I-KEY", "B-VALUE", "I-VALUE")


class LayoutDocumentIndexer(BaseDocumentIndexer):
    @classmethod
    def from_zoo(cls, name: str = "layout-indexer-synth",
                 labels=SYNTH_NER_LABELS) -> "LayoutDocumentIndexer | None":
        """Load the in-repo synthetic-trained indexer if present."""
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
    def from_zoo_chain(cls, name: str = "layout-indexer-chain",
                       labels=SYNTH_NER_LABELS):
        """The on-device-chain head (scripts/train_chain_heads.py)."""
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
        labels: Sequence[str] = ("O", "B-KEY", "I-KEY", "B-VALUE", "I-VALUE"),
        config: Optional[LayoutLMConfig] = None,
        params=None,
        tokenizer: Optional[HashWordTokenizer] = None,
        window: Optional[int] = None,
        stride: int = 128,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.labels = list(labels)
        self.config = config or LayoutLMConfig.base(num_labels=len(self.labels))
        self.model = LayoutLMv3ForTokenClassification(self.config)
        self.tokenizer = tokenizer or HashWordTokenizer(self.config.vocab_size)
        self.window = window or self.config.max_seq_len
        self.stride = min(stride, self.window)
        if params is None:
            l = self.window
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, l), jnp.int32),
                jnp.zeros((1, l, 4), jnp.int32),
                jnp.ones((1,), jnp.int32),
                None,
            )
        self.params = params
        self._fwd = jax.jit(lambda p, t, b, s: self.model.apply(p, t, b, s, None))

    def index(
        self,
        pages: Sequence[PageInput],
        entities_to_group: Optional[Sequence[Dict[str, Any]]] = None,
        validate: bool = True,
    ) -> List[Dict[str, Any]]:
        """Per page: {"entities": [...], "groups": {...}}.

        ``entities_to_group`` definitions ([{"name", "entities"}], the
        reference's composite-entity config) turn word-level predictions
        into line-aggregated EntityGroups; registered validators add
        ``normalized``/``valid`` fields per entity (reference
        transformers.py:703 + validator.py).
        """
        out = []
        for page in pages:
            result = self._index_page(page)
            if validate:
                self._apply_validators(result["entities"])
            if entities_to_group and page.boxes:
                result["groups"] = self._group_entities(
                    page, result, entities_to_group
                )
            out.append(result)
        return out

    def _apply_validators(self, entities: List[Dict[str, Any]]) -> None:
        from marie_tpu.components.document_indexer.validator import (
            get_validator,
        )

        for e in entities:
            v = get_validator(e["label"])
            if v is None:
                continue
            try:
                e["normalized"] = v(e["text"])
                e["valid"] = True
            except ValueError as err:
                e["valid"] = False
                e["validation_error"] = str(err)

    def _group_entities(self, page, result, definitions):
        import dataclasses

        from marie_tpu.boxes.line_processor import line_merge
        from marie_tpu.components.document_indexer.aggregation import (
            group_composites,
        )

        n = len(page.words)
        # word-level BIO tags from the decoded entities
        predictions = ["O"] * n
        scores = [0.0] * n
        for e in result["entities"]:
            s, t = e["word_span"]
            for i in range(s, min(t, n)):
                predictions[i] = ("B-" if i == s else "I-") + e["label"]
                scores[i] = e["score"]
        lines_bboxes = line_merge(np.zeros((1, 1), np.uint8), page.boxes)
        groups = group_composites(
            definitions, lines_bboxes, page.boxes, predictions, scores
        )
        return {
            name: [dataclasses.asdict(g) for g in gs]
            for name, gs in groups.items()
        }

    def _index_page(self, page: PageInput) -> Dict[str, Any]:
        n = len(page.words)
        if n == 0:
            return {"entities": []}
        l = self.window
        tokens = np.zeros((max(n, 1),), np.int32)
        boxes = np.zeros((max(n, 1), 4), np.int32)
        t, b, _ = self.tokenizer.encode_page(
            page.words, page.boxes, page.page_size, max(n, 1), self.config.max_2d_pos
        )
        tokens[: len(t)] = t[: len(tokens)]
        boxes[: len(b)] = b[: len(boxes)]

        win_t, win_b, starts, valid = sliding_windows(
            jnp.asarray(tokens), jnp.asarray(boxes), window=l, stride=self.stride
        )
        seq_len = jnp.sum(valid, axis=1).astype(jnp.int32)
        logits = self._fwd(self.params, win_t, win_b, seq_len)
        merged = merge_window_logits(logits, starts, valid, n)
        probs = np.asarray(jax.nn.softmax(merged, axis=-1))
        pred = probs.argmax(axis=-1)
        return {"entities": self._bio_decode(pred, probs, page.words)}

    def _bio_decode(self, pred, probs, words) -> List[Dict[str, Any]]:
        """Aggregate BIO tags into entities with word spans."""
        entities = []
        cur = None
        for i, p in enumerate(pred):
            label = self.labels[int(p)]
            score = float(probs[i, int(p)])
            if label.startswith("B-") or (
                label.startswith("I-") and (cur is None or cur["label"] != label[2:])
            ):
                if cur:
                    entities.append(cur)
                cur = {
                    "label": label[2:],
                    "words": [words[i]],
                    "scores": [score],
                    "word_span": [i, i + 1],
                }
            elif label.startswith("I-") and cur is not None:
                cur["words"].append(words[i])
                cur["scores"].append(score)
                cur["word_span"][1] = i + 1
            else:  # O
                if cur:
                    entities.append(cur)
                    cur = None
        if cur:
            entities.append(cur)
        return [
            {
                "label": e["label"],
                "text": " ".join(e["words"]),
                "score": float(np.mean(e["scores"])),
                "word_span": tuple(e["word_span"]),
            }
            for e in entities
        ]
