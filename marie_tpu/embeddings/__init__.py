from marie_tpu.embeddings.base import EmbeddingsBase
from marie_tpu.embeddings.layout_embeddings import LayoutEmbeddingsModel

__all__ = ["EmbeddingsBase", "LayoutEmbeddingsModel"]
