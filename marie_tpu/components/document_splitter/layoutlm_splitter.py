"""Document splitter — per-page boundary classification.

Capability parity with the reference's ``TransformersDocumentSplitter``
(``/root/reference/marie/components/document_splitter/transformers.py:30``
— LayoutLMv3 page classification driving multi-page split decisions).
Re-uses the sequence classifier; pages labelled as boundaries start new
documents.
"""

from typing import Any, Dict, List, Optional, Sequence

from marie_tpu.components.base import BaseDocumentSplitter, PageInput
from marie_tpu.components.document_classifier.layoutlm_classifier import (
    LayoutDocumentClassifier,
)
from marie_tpu.models.configs import LayoutLMConfig


class LayoutDocumentSplitter(BaseDocumentSplitter):
    def __init__(
        self,
        labels: Sequence[str] = ("continuation", "boundary"),
        boundary_label: str = "boundary",
        config: Optional[LayoutLMConfig] = None,
        params=None,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.boundary_label = boundary_label
        if params is None and config is None:
            # default: the in-repo synthetic-trained boundary classifier
            # (scripts/train_splitter.py -> model_zoo/layout-splitter-synth)
            from marie_tpu.registry.zoo import zoo_params

            params = zoo_params("layout-splitter-synth")
            if params is not None:
                config = LayoutLMConfig.synth(num_labels=len(labels))
        self.classifier = LayoutDocumentClassifier(
            labels=labels, config=config, params=params
        )

    def split(self, pages: Sequence[PageInput]) -> List[Dict[str, Any]]:
        preds = self.classifier.predict(pages)
        out = []
        for i, p in enumerate(preds):
            out.append(
                {
                    "label": p["label"],
                    "score": p["score"],
                    # first page always starts a document
                    "is_boundary": i == 0 or p["label"] == self.boundary_label,
                }
            )
        return out

    @staticmethod
    def to_documents(split_results: List[Dict[str, Any]]) -> List[List[int]]:
        """Group page indices into documents by boundary flags."""
        docs: List[List[int]] = []
        for i, r in enumerate(split_results):
            if r["is_boundary"] or not docs:
                docs.append([i])
            else:
                docs[-1].append(i)
        return docs
