from marie_tpu.types.docs import Document, DocumentArray

__all__ = ["Document", "DocumentArray"]
