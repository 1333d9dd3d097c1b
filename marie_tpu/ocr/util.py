"""Engine registry (reference: ``/root/reference/marie/ocr/util.py:89``
``get_known_ocr_engines`` — mock/default/best)."""

from typing import Dict, Optional

from marie_tpu.ocr.ocr_engine import OcrEngine


def get_known_ocr_engines(
    device: str = "tpu", engine: Optional[str] = None
) -> Dict[str, OcrEngine]:
    """Build the known engines. ``engine`` restricts to one name.

    * ``mock``    — canned results, no models
    * ``default`` — CRAFT + TrOCR greedy (serving preset)
    * ``best``    — CRAFT detection + voting ensemble (TrOCR beam-5 + CRNN)
    """
    engines: Dict[str, OcrEngine] = {}
    names = [engine] if engine else ["mock", "default", "best"]

    for name in names:
        if name == "mock":
            from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine

            engines["mock"] = MockOcrEngine()
        elif name == "default":
            from marie_tpu.ocr.default_ocr_engine import DefaultOcrEngine

            engines["default"] = DefaultOcrEngine()
        elif name == "best":
            from marie_tpu.boxes.craft_box_processor import BoxProcessorCraft
            from marie_tpu.document.crnn_ocr_processor import CrnnOcrProcessor
            from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
            from marie_tpu.ocr.voting_ocr_engine import VotingOcrEngine

            engines["best"] = VotingOcrEngine(
                box_processor=BoxProcessorCraft(),
                ocr_processors=[
                    TrOcrProcessor(beam_size=5),
                    CrnnOcrProcessor(),
                ],
            )
    return engines
