from marie_tpu.scheduler.models import ExistingWorkPolicy, WorkInfo
from marie_tpu.scheduler.job_scheduler import JobScheduler
from marie_tpu.scheduler.sql import SqlJobScheduler

__all__ = ["WorkInfo", "ExistingWorkPolicy", "JobScheduler", "SqlJobScheduler"]
