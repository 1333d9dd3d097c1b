from marie_tpu.renderer.renderer import ResultRenderer
from marie_tpu.renderer.text_renderer import TextRenderer
from marie_tpu.renderer.pdf_renderer import PdfRenderer
from marie_tpu.renderer.adlib_renderer import AdlibRenderer
from marie_tpu.renderer.blob_renderer import BlobRenderer

__all__ = [
    "ResultRenderer",
    "TextRenderer",
    "PdfRenderer",
    "AdlibRenderer",
    "BlobRenderer",
]
