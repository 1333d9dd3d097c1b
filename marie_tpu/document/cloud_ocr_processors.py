"""Cloud OCR processor shells — config-surface parity with the
reference's unimplemented cloud engines
(``/root/reference/marie/document/google_vision_ocr.py``,
``azure_vision_ocr.py``, ``aws_textract_ocr.py`` — each a ~30-line
shell whose ``recognize_from_fragments`` raises NotImplementedError and
``is_available()`` returns False).

They exist so YAML configs naming these engines load cleanly and the
voting engine skips them, exactly as in the reference.  A deployment
that wires real cloud credentials would subclass and implement
``recognize_from_fragments``.
"""

from typing import Any, Dict, List, Sequence

import numpy as np

from marie_tpu.document.ocr_processor import OcrProcessor


class _CloudOcrShell(OcrProcessor):
    """Common shell: never available, raises on use (reference parity)."""

    _SERVICE = "cloud"

    def __init__(self, work_dir: str = "/tmp/icr", **kwargs):
        super().__init__(work_dir, **kwargs)

    def is_available(self) -> bool:
        return False

    def recognize_from_fragments(
        self, fragments: Sequence[np.ndarray], **kwargs
    ) -> List[Dict[str, Any]]:
        raise NotImplementedError(
            f"{self._SERVICE} OCR is not implemented; subclass and wire "
            "credentials to use it"
        )


class GoogleVisionOcrProcessor(_CloudOcrShell):
    """Reference ``google_vision_ocr.py:8``."""

    _SERVICE = "Google Vision"


class AzureVisionOcrProcessor(_CloudOcrShell):
    """Reference ``azure_vision_ocr.py``."""

    _SERVICE = "Azure Vision"


class AwsTextractOcrProcessor(_CloudOcrShell):
    """Reference ``aws_textract_ocr.py``."""

    _SERVICE = "AWS Textract"
