"""DefaultOcrEngine — CRAFT detection + TrOCR recognition
(reference: ``/root/reference/marie/ocr/default_ocr_engine.py:15`` pairs
the default detector with TrOCR)."""

from typing import Optional

from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
from marie_tpu.ocr.ocr_engine import PipelineOcrEngine


class DefaultOcrEngine(PipelineOcrEngine):
    def __init__(
        self,
        models_dir: str = "",
        box_processor: Optional[BoxProcessorCraft] = None,
        ocr_processor: Optional[TrOcrProcessor] = None,
        beam_size: int = 1,
        **kwargs,
    ):
        box = box_processor or BoxProcessorCraft(models_dir=models_dir)
        icr = ocr_processor or TrOcrProcessor(beam_size=beam_size)
        super().__init__(box, icr, **kwargs)
