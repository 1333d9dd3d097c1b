"""Event payload models (reference: marie/messaging/events.py)."""

import time
from typing import Any, Dict, Optional

from pydantic import BaseModel, Field


class MarieEvent(BaseModel):
    api_key: str = ""
    job_id: str
    event: str
    job_tag: str = ""
    status: str = ""
    timestamp: float = Field(default_factory=time.time)
    payload: Optional[Dict[str, Any]] = None

    def to_dict(self) -> Dict[str, Any]:
        return self.model_dump()
