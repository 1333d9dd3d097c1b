"""Tesseract recognizer shell (reference:
``/root/reference/marie/document/tesseract_ocr_processor.py:14``).

pytesseract / the tesseract binary are not present in this environment;
the processor registers for config parity and reports unavailability
cleanly (`is_available()` False) so the voting engine skips it, exactly
how the reference treats optional engines.
"""

from typing import Any, Dict, List, Sequence

import numpy as np

from marie_tpu.document.ocr_processor import OcrProcessor


class TesseractOcrProcessor(OcrProcessor):
    def __init__(self, work_dir: str = "/tmp/icr", lang: str = "eng", **kwargs):
        super().__init__(work_dir, **kwargs)
        self.lang = lang
        try:
            import pytesseract  # noqa: F401

            self._available = True
        except ImportError:
            self._available = False

    def is_available(self) -> bool:
        return self._available

    def recognize_from_fragments(
        self, fragments: Sequence[np.ndarray]
    ) -> List[Dict[str, Any]]:
        if not self._available:
            raise RuntimeError(
                "pytesseract is not installed; TesseractOcrProcessor is "
                "unavailable in this environment"
            )
        import pytesseract
        from PIL import Image

        out = []
        for frag in fragments:
            text = pytesseract.image_to_string(
                Image.fromarray(frag), lang=self.lang, config="--psm 8"
            ).strip()
            out.append({"text": text, "confidence": 0.9 if text else 0.0})
        return out
