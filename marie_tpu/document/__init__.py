from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
from marie_tpu.document.crnn_ocr_processor import CrnnOcrProcessor

__all__ = ["OcrProcessor", "TrOcrProcessor", "CrnnOcrProcessor"]
