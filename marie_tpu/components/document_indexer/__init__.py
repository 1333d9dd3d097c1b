from marie_tpu.components.document_indexer.layoutlm_indexer import (
    LayoutDocumentIndexer,
)

__all__ = ["LayoutDocumentIndexer"]
