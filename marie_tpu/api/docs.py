"""API doc schemas (reference: /root/reference/marie/api/docs.py:18-40)."""

from typing import Any, Dict, List, Optional

import numpy as np
from pydantic import Field, field_validator

from marie_tpu.types.docs import BaseDoc, Document, _to_numpy

DOC_KEY_PAGE_NUMBER = "page_number"
DOC_KEY_CLASSIFICATION = "classification"
DOC_KEY_INDEXER = "indexer"
DOC_KEY_ASSET_KEY = "asset_key"


class AssetKeyDoc(BaseDoc):
    """Points at a stored document asset plus an optional page subset."""

    asset_key: str
    pages: Optional[List[int]] = None


class StorageDoc(BaseDoc):
    content: Optional[Any] = None
    blob: Optional[Any] = None
    tensor: Optional[np.ndarray] = None
    tags: Optional[Dict[str, Any]] = None
    embedding: Optional[np.ndarray] = None

    @field_validator("tensor", "embedding", mode="before")
    @classmethod
    def _coerce(cls, v):
        return _to_numpy(v)


class MarieDoc(Document):
    """Image doc with tags (reference MarieDoc extends docarray ImageDoc)."""

    tags: Dict[str, Any] = Field(default_factory=dict)


class BatchableMarieDoc(MarieDoc):
    words: List[Any] = Field(default_factory=list)
    boxes: List[Any] = Field(default_factory=list)


class OutputDoc(BaseDoc):
    jobid: str
    status: str
