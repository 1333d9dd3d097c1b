from marie_tpu.components.document_classifier.layoutlm_classifier import (
    LayoutDocumentClassifier,
)

__all__ = ["LayoutDocumentClassifier"]
