from marie_tpu.job.partition.job_partitioner import JobPartition, MarieJobPartitioner

__all__ = ["MarieJobPartitioner", "JobPartition"]
