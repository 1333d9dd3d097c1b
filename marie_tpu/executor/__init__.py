from marie_tpu.executor.text_extraction_executor import (
    TextExtractionExecutor,
    TextExtractionExecutorMock,
)
from marie_tpu.executor.classifier_executor import DocumentClassificationExecutor
from marie_tpu.executor.ner_executor import NerExtractionExecutor
from marie_tpu.executor.overlay_executor import OverlayExecutor
from marie_tpu.executor.template_matching_executor import (
    TemplateMatchingExecutor,
)

__all__ = [
    "TextExtractionExecutor",
    "TextExtractionExecutorMock",
    "DocumentClassificationExecutor",
    "NerExtractionExecutor",
    "OverlayExecutor",
    "TemplateMatchingExecutor",
]
