from marie_tpu.document.ocr_processor import OcrProcessor
from marie_tpu.document.trocr_ocr_processor import TrOcrProcessor
from marie_tpu.document.crnn_ocr_processor import CrnnOcrProcessor
from marie_tpu.document.tesseract_ocr_processor import TesseractOcrProcessor
from marie_tpu.document.cloud_ocr_processors import (
    AwsTextractOcrProcessor,
    AzureVisionOcrProcessor,
    GoogleVisionOcrProcessor,
)

__all__ = [
    "OcrProcessor",
    "TrOcrProcessor",
    "CrnnOcrProcessor",
    "TesseractOcrProcessor",
    "GoogleVisionOcrProcessor",
    "AzureVisionOcrProcessor",
    "AwsTextractOcrProcessor",
]
