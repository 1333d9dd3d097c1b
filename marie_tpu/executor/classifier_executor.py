"""DocumentClassificationExecutor (reference:
``/root/reference/marie/executor/classifier/document_classifier_executor.py:28``)."""

from typing import Any, Dict, Optional

import numpy as np

from marie_tpu.components.base import PageInput
from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests, safely_encoded
from marie_tpu.types.docs import DocumentArray


class DocumentClassificationExecutor(BaseExecutor):
    def __init__(self, classifier=None, labels=None, **kwargs):
        super().__init__(**kwargs)
        if classifier is None:
            from marie_tpu.components.document_classifier import (
                LayoutDocumentClassifier,
            )

            classifier = LayoutDocumentClassifier.from_zoo()
            if classifier is None:
                from marie_tpu.models.configs import LayoutLMConfig

                labels = tuple(labels or ("negative", "positive"))
                classifier = LayoutDocumentClassifier(
                    labels=labels,
                    config=LayoutLMConfig.base(num_labels=len(labels)),
                )
        self.classifier = classifier

    @requests(on="/document/classify")
    @safely_encoded
    def classify(self, docs: DocumentArray, parameters: Dict[str, Any], **kwargs):
        pages = []
        for doc in docs:
            words = doc.tags.get("words", [])
            boxes = doc.tags.get("boxes", [])
            image = (
                np.asarray(doc.tensor).astype(np.uint8)
                if doc.tensor is not None
                else None
            )
            pages.append(PageInput(words, boxes, image))
        preds = self.classifier.predict(pages)
        for doc, pred in zip(docs, preds):
            doc.tags["classification"] = pred
        return {
            "status": "succeeded",
            "classifications": preds,
        }
