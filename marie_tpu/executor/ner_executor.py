"""NerExtractionExecutor (reference:
``/root/reference/marie/executor/ner/ner_extraction_executor.py:48`` —
OCR → token classification → entity aggregation)."""

from typing import Any, Dict, Optional

import numpy as np

from marie_tpu.components.base import PageInput
from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests, safely_encoded
from marie_tpu.types.docs import DocumentArray


class NerExtractionExecutor(BaseExecutor):
    def __init__(self, indexer=None, ocr_engine=None, labels=None, **kwargs):
        super().__init__(**kwargs)
        if indexer is None:
            from marie_tpu.components.document_indexer import (
                LayoutDocumentIndexer,
            )

            indexer = LayoutDocumentIndexer.from_zoo()
            if indexer is None:
                from marie_tpu.models.configs import LayoutLMConfig

                labels = tuple(
                    labels or ("O", "B-KEY", "I-KEY", "B-VALUE", "I-VALUE")
                )
                indexer = LayoutDocumentIndexer(
                    labels=labels,
                    config=LayoutLMConfig.base(num_labels=len(labels)),
                )
        self.indexer = indexer
        self.ocr_engine = ocr_engine  # optional: run OCR when docs lack words

    @requests(on="/ner/extract")
    @safely_encoded
    def extract(self, docs: DocumentArray, parameters: Dict[str, Any], **kwargs):
        pages = []
        for doc in docs:
            words = doc.tags.get("words")
            boxes = doc.tags.get("boxes")
            image = (
                np.asarray(doc.tensor).astype(np.uint8)
                if doc.tensor is not None
                else None
            )
            if (not words) and image is not None and self.ocr_engine is not None:
                result = self.ocr_engine.extract([image])[0]
                words = [w["text"] for w in result["words"]]
                boxes = [w["box"] for w in result["words"]]
            pages.append(PageInput(words or [], boxes or [], image))
        results = self.indexer.index(pages)
        for doc, res in zip(docs, results):
            doc.tags["indexer"] = res
        return {"status": "succeeded", "entities": results}
