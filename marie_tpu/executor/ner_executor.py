"""NerExtractionExecutor (reference:
``/root/reference/marie/executor/ner/ner_extraction_executor.py:48`` —
OCR → token classification → entity aggregation)."""

from typing import Any, Dict, Optional

import numpy as np

from marie_tpu.components.base import PageInput
from marie_tpu.executor.storage import StorageMixin
from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests, safely_encoded
from marie_tpu.types.docs import DocumentArray


class NerExtractionExecutor(StorageMixin, BaseExecutor):
    def __init__(self, indexer=None, ocr_engine=None, labels=None,
                 reading_order: Optional[bool] = None,
                 storage_enabled: bool = False,
                 storage_conf: Optional[Dict[str, Any]] = None, **kwargs):
        super().__init__(**kwargs)
        # result persistence (reference ner_extraction_executor.py:941
        # `persist` — ner_results StorageDocs after indexing)
        self.setup_storage(storage_enabled, storage_conf,
                           silence_exceptions=True)
        # LayoutReader stage (reference ner_extraction_executor applies it
        # between OCR and token classification): the learned ranker of
        # document/layoutreader.py; auto-enabled when the trained
        # checkpoint is in the model zoo
        self.text_layout = None
        if reading_order is not False:
            try:
                from marie_tpu.document.layoutreader import (
                    _DEFAULT_CKPT,
                    load_text_layout,
                )
                import os

                if reading_order or os.path.isdir(_DEFAULT_CKPT):
                    self.text_layout = load_text_layout()
            except Exception:  # noqa: BLE001 — ordering is best-effort
                self.text_layout = None
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
            if words and boxes and self.text_layout is not None:
                # xywh -> xyxy, model reading order, re-sequence both lists.
                # The ranker is trained on page-relative [0,1] coords, so
                # normalize by the PAGE size when the image is present
                # (matching reorder_page_result); the box-span heuristic is
                # only a fallback when no page geometry is available.
                xyxy = [[b[0], b[1], b[0] + b[2], b[1] + b[3]] for b in boxes]
                if image is not None:
                    span = float(max(image.shape[0], image.shape[1]))
                else:
                    span = max((max(b[2], b[3]) for b in xyxy), default=1.0)
                order = self.text_layout.order(xyxy, scale=max(span, 1.0))
                words = [words[j] for j in order]
                boxes = [boxes[j] for j in order]
            pages.append(PageInput(words or [], boxes or [], image))
        results = self.indexer.index(pages)
        for doc, res in zip(docs, results):
            doc.tags["indexer"] = res
        if self.storage_enabled:
            from marie_tpu.api.docs import StorageDoc

            ref_id = str(parameters.get(
                "ref_id", docs[0].id if len(docs) else ""))
            self.store(
                ref_id=ref_id,
                ref_type=str(parameters.get("ref_type", "doc")),
                store_mode="content",
                docs=[StorageDoc(
                    content=results,
                    tags={"action": "ner", "index": -1,
                          "type": "ner_results", "ttl": 48 * 60,
                          "checksum": ref_id},
                )],
            )
        return {"status": "succeeded", "entities": results}
