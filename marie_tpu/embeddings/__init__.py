from marie_tpu.embeddings.base import EmbeddingsBase
from marie_tpu.embeddings.hashing import HashingEmbeddings
from marie_tpu.embeddings.layout_embeddings import LayoutEmbeddingsModel
from marie_tpu.embeddings.transformers_embeddings import TransformersEmbeddings

__all__ = [
    "EmbeddingsBase",
    "HashingEmbeddings",
    "LayoutEmbeddingsModel",
    "TransformersEmbeddings",
]
