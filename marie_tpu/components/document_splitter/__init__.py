from marie_tpu.components.document_splitter.layoutlm_splitter import (
    LayoutDocumentSplitter,
)

__all__ = ["LayoutDocumentSplitter"]
