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


class PGVectorStore:
    """DBAPI-backed vector store over a pgvector table (reference
    ``marie/vectorstores/pgvector/pgvector.py`` — same surface:
    ``similarity_search[_with_score]`` issuing ``ORDER BY embedding <->``
    nearest-neighbor SQL).  The connection is injected (any DBAPI conn
    whose server understands the pgvector operator), so deployments wire
    psycopg2 in and tests wire a fake."""

    def __init__(self, conn, table: str = "marie_vectors"):
        self.conn = conn
        self.table = table

    def ensure_schema(self, dim: int) -> None:
        with self.conn.cursor() as cur:
            cur.execute(
                f"CREATE TABLE IF NOT EXISTS {self.table} "
                f"(id TEXT PRIMARY KEY, embedding vector({dim}), "
                "metadata JSONB)"
            )
        self.conn.commit()

    def add(self, ids: Sequence[str], vectors, metadata=None) -> None:
        metadata = metadata or [None] * len(ids)
        with self.conn.cursor() as cur:
            for i, (id_, vec) in enumerate(zip(ids, vectors)):
                cur.execute(
                    f"INSERT INTO {self.table} (id, embedding, metadata) "
                    "VALUES (%s, %s, %s) ON CONFLICT (id) DO UPDATE SET "
                    "embedding = EXCLUDED.embedding, "
                    "metadata = EXCLUDED.metadata",
                    (id_, list(np.asarray(vec, dtype=float)), metadata[i]),
                )
        self.conn.commit()

    def similarity_search_with_score(
        self, query_vector, k: int = 5
    ) -> List[Tuple[str, float]]:
        """Top-k (id, distance) by pgvector nearest-neighbor order."""
        with self.conn.cursor() as cur:
            cur.execute(
                f"SELECT id, embedding <-> %s AS score FROM {self.table} "
                "ORDER BY score LIMIT %s",
                (list(np.asarray(query_vector, dtype=float)), int(k)),
            )
            return [(row[0], float(row[1])) for row in cur.fetchall()]

    def similarity_search(self, query_vector, k: int = 5) -> List[str]:
        return [
            id_ for id_, _ in self.similarity_search_with_score(query_vector, k)
        ]
