from marie_tpu.job.common import JobInfo, JobInfoStorageClient
from marie_tpu.job.job_manager import JobManager

__all__ = ["JobManager", "JobInfo", "JobInfoStorageClient"]
