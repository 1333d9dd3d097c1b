"""OverlayExecutor (reference:
``/root/reference/marie/executor/overlay/overlay_executor.py:17`` —
document cleanup endpoint returning cleaned frames)."""

from typing import Any, Dict

import numpy as np

from marie_tpu.serve.executors import BaseExecutor
from marie_tpu.serve.executors.decorators import requests
from marie_tpu.types.docs import DocumentArray


class OverlayExecutor(BaseExecutor):
    def __init__(self, overlay_processor=None, **kwargs):
        super().__init__(**kwargs)
        if overlay_processor is None:
            from marie_tpu.overlay import OverlayProcessor

            overlay_processor = OverlayProcessor()
        self.processor = overlay_processor

    @requests(on="/overlay/segment")
    def segment(self, docs: DocumentArray, parameters: Dict[str, Any], **kwargs):
        for doc in docs:
            if doc.tensor is None:
                continue
            frame = np.asarray(doc.tensor).astype(np.uint8)
            if frame.ndim == 2:
                frame = np.stack([frame] * 3, -1)
            _, mask, clean = self.processor.segment_frame(doc.id, frame)
            doc.tensor = clean
            doc.tags["overlay_mask_mean"] = float(mask.mean())
        return docs
