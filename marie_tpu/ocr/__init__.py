from marie_tpu.enums import CoordinateFormat, PSMode
from marie_tpu.ocr.ocr_engine import OcrEngine
from marie_tpu.ocr.default_ocr_engine import DefaultOcrEngine
from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine
from marie_tpu.ocr.voting_ocr_engine import VotingOcrEngine
from marie_tpu.ocr.util import get_known_ocr_engines

__all__ = [
    "OcrEngine",
    "DefaultOcrEngine",
    "MockOcrEngine",
    "VotingOcrEngine",
    "CoordinateFormat",
    "PSMode",
    "get_known_ocr_engines",
]
