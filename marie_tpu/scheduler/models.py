"""Scheduler data models (reference: marie/scheduler/models.py)."""

import time
import uuid
from typing import Any, Dict, Optional

from pydantic import BaseModel, Field

from marie_tpu.enums import WorkState


class RetryPolicy(BaseModel):
    retry_limit: int = 2
    retry_delay: float = 1.0
    retry_backoff: bool = True


DEFAULT_RETRY_POLICY = RetryPolicy()


class ExistingWorkPolicy:
    """What to do when a job with the same name already exists."""

    KEEP_EXISTING = "keep_existing"
    REPLACE_EXISTING = "replace_existing"
    ALLOW_DUPLICATE = "allow_duplicate"
    REJECT_DUPLICATE = "reject_duplicate"


class WorkInfo(BaseModel):
    id: str = Field(default_factory=lambda: uuid.uuid4().hex)
    name: str  # queue name
    priority: int = 0
    state: WorkState = WorkState.CREATED
    retry_limit: int = 2
    retry_count: int = 0
    retry_delay: float = 1.0
    retry_backoff: bool = True
    start_after: float = 0.0  # unix ts; 0 = now
    expire_in_seconds: float = 0.0
    data: Dict[str, Any] = Field(default_factory=dict)
    created_on: float = Field(default_factory=time.time)
    started_on: Optional[float] = None
    completed_on: Optional[float] = None
    policy: str = ExistingWorkPolicy.ALLOW_DUPLICATE
    # terminal-failure routing: re-enqueue the payload on this queue when
    # the retry budget is exhausted or the job expires (pg-boss
    # dead_letter — reference marie/scheduler/fixtures.py:56,89)
    dead_letter: Optional[str] = None
    # retention: terminal jobs stay queryable until this unix ts before
    # the archiver moves them (pg-boss keep_until — fixtures.py:103)
    keep_until: float = 0.0
    # handler result / terminal error payload (pg-boss output column)
    output: Optional[Any] = None

    def to_row(self) -> Dict[str, Any]:
        d = self.model_dump()
        d["state"] = self.state.value
        return d
