"""Job partitioning — chunk multi-page work across workers/hosts.

Parity with the reference (``/root/reference/marie/job/partition/job_partitioner.py:9``
+ ``scheduler/psql.py:939`` ``calculate_splits``).
"""

import dataclasses
from typing import Any, Dict, List

from marie_tpu.scheduler.models import WorkInfo


@dataclasses.dataclass
class JobPartition:
    partition_id: int
    start_page: int
    end_page: int  # exclusive
    data: Dict[str, Any]


class MarieJobPartitioner:
    def __init__(self, chunk_size: int = 16):
        self.chunk_size = chunk_size

    def partition(self, work: WorkInfo) -> List[JobPartition]:
        """Split a WorkInfo covering N pages into page-range chunks."""
        pages = int(work.data.get("num_pages", 1))
        out: List[JobPartition] = []
        for i, start in enumerate(range(0, pages, self.chunk_size)):
            end = min(start + self.chunk_size, pages)
            out.append(
                JobPartition(
                    partition_id=i,
                    start_page=start,
                    end_page=end,
                    data={**work.data, "page_range": [start, end]},
                )
            )
        return out
