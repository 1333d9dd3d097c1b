"""Embeddings base (reference: ``/root/reference/marie/embeddings/base.py:10``
— pluggable text/document embedding providers)."""

from abc import ABC, abstractmethod
from typing import List, Sequence

import numpy as np

from marie_tpu.jaml import JAMLCompatible
from marie_tpu.logging_core import MarieLogger


class EmbeddingsBase(JAMLCompatible, ABC):
    def __init__(self, **kwargs):
        self.logger = MarieLogger(type(self).__name__)

    @abstractmethod
    def get_embeddings(self, texts: Sequence[str], **kwargs) -> np.ndarray:
        """[N texts] -> [N, D] float32 embeddings."""

    def embed_query(self, text: str) -> np.ndarray:
        return self.get_embeddings([text])[0]
