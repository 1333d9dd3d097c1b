"""Document-AI components (classification, splitting, indexing/NER,
registration, template matching) — reference
``/root/reference/marie/components/``."""

from marie_tpu.components.base import (
    BaseDocumentClassifier,
    BaseDocumentIndexer,
    BaseDocumentSplitter,
)

__all__ = [
    "BaseDocumentClassifier",
    "BaseDocumentIndexer",
    "BaseDocumentSplitter",
]
