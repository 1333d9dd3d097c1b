"""Multi-host initialization — the JAX distributed runtime over DCN.

SURVEY.md §2.5: the reference never does inter-GPU communication; on TPU
slices, multi-host coordination is new required capability.  Hosts join
the coordination service, then every `jax.device_count()`-wide mesh spans
the full slice and collectives ride ICI/DCN automatically.
"""

import os
from typing import Optional

from marie_tpu.logging_core import MarieLogger

logger = MarieLogger("distributed")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the JAX coordination service (no-op single-host).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are omitted (the usual TPU-VM env contract).  Returns True when
    multi-host mode is active.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        f"joined slice: process {process_id}/{num_processes}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
    return True


def host_shard_bounds(total: int) -> tuple:
    """[start, end) of this host's shard of a page stream (per-host shard
    of the data stream, SURVEY.md §7 step 10)."""
    import jax

    n = jax.process_count()
    i = jax.process_index()
    per = -(-total // n)
    return min(i * per, total), min((i + 1) * per, total)
