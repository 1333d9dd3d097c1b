"""JobScheduler ABC (reference: marie/scheduler/job_scheduler.py)."""

from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional

from marie_tpu.enums import WorkState
from marie_tpu.scheduler.models import WorkInfo


class JobScheduler(ABC):
    @abstractmethod
    async def start(self) -> None: ...

    @abstractmethod
    async def stop(self) -> None: ...

    @abstractmethod
    async def submit_job(self, work_info: WorkInfo, **kwargs) -> str: ...

    @abstractmethod
    async def get_job(self, job_id: str) -> Optional[WorkInfo]: ...

    @abstractmethod
    async def list_jobs(
        self, state: Optional[WorkState] = None, limit: int = 100
    ) -> List[WorkInfo]: ...

    @abstractmethod
    async def cancel_job(self, job_id: str) -> bool: ...

    @abstractmethod
    async def resume_job(self, job_id: str) -> bool: ...
