"""ClassificationPipeline — OCR (reuse if provided) + classification +
optional split grouping.

Parity with the reference's ``ClassificationPipeline``
(``/root/reference/marie/pipe/classification_pipeline.py:28``).
"""

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from marie_tpu.components.base import PageInput
from marie_tpu.enums import CoordinateFormat, PSMode
from marie_tpu.logging_core import TimeContext
from marie_tpu.pipe.base_pipeline import BasePipeline


class ClassificationPipeline(BasePipeline):
    def __init__(
        self,
        ocr_engine=None,
        classifiers: Optional[Sequence] = None,
        splitter=None,
        **kwargs,
    ):
        super().__init__(classifiers=classifiers, **kwargs)
        self.ocr_engine = ocr_engine
        self.splitter = splitter

    def execute(
        self,
        ref_id: str,
        ref_type: str,
        frames: List[np.ndarray],
        ocr_results: Optional[List[Dict[str, Any]]] = None,
        job_id: str = "",
        runtime_conf: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        frames = [np.asarray(f) for f in frames]
        if ocr_results is None:
            if self.ocr_engine is None:
                raise ValueError("no ocr_results given and no ocr_engine configured")
            with TimeContext("ocr", self.logger):
                ocr_results = self.ocr_engine.extract(
                    frames, PSMode.SPARSE, CoordinateFormat.XYWH
                )

        metadata: Dict[str, Any] = {
            "ref_id": ref_id,
            "ref_type": ref_type,
            "job_id": job_id,
            "pages": len(frames),
            "pipeline": type(self).__name__,
            "ocr": ocr_results,
        }
        self.execute_classifier_and_indexer_pipeline(
            frames, ocr_results, metadata, True, False
        )

        if self.splitter is not None:
            pages = [
                PageInput.from_ocr_result(r, f) for r, f in zip(ocr_results, frames)
            ]
            split = self.splitter.split(pages)
            metadata["splitter"] = split
            metadata["documents"] = type(self.splitter).to_documents(split)
        return metadata
