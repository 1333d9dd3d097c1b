"""Vector store — embedding search over documents.

Counterpart of the reference's pgvector stub (``marie/vectorstores/``),
implemented as a working in-memory store with exact cosine search on
device-computed embeddings; a pgvector backend can implement the same
interface when a PostgreSQL driver exists.
"""

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np


class InMemoryVectorStore:
    def __init__(self, embeddings_model=None):
        self.embeddings_model = embeddings_model
        self._vectors: List[np.ndarray] = []
        self._payloads: List[Dict[str, Any]] = []

    def add(
        self,
        texts: Sequence[str],
        payloads: Optional[Sequence[Dict[str, Any]]] = None,
        vectors: Optional[np.ndarray] = None,
    ) -> None:
        if vectors is None:
            if self.embeddings_model is None:
                raise ValueError("provide vectors or an embeddings_model")
            vectors = self.embeddings_model.get_embeddings(texts)
        payloads = payloads or [{"text": t} for t in texts]
        for v, p in zip(np.asarray(vectors), payloads):
            n = np.linalg.norm(v)
            self._vectors.append(v / max(n, 1e-8))
            self._payloads.append(dict(p))

    def search(
        self, query: str | np.ndarray, k: int = 5
    ) -> List[Tuple[float, Dict[str, Any]]]:
        if not self._vectors:
            return []
        if isinstance(query, str):
            if self.embeddings_model is None:
                raise ValueError("text query needs an embeddings_model")
            qv = self.embeddings_model.embed_query(query)
        else:
            qv = np.asarray(query)
        qv = qv / max(np.linalg.norm(qv), 1e-8)
        mat = np.stack(self._vectors)
        scores = mat @ qv
        order = np.argsort(-scores)[:k]
        return [(float(scores[i]), self._payloads[i]) for i in order]

    def __len__(self) -> int:
        return len(self._vectors)
