"""Device mesh construction.

The reference scales by service-level replication only (SURVEY.md §2.5 —
``Deployment(replicas=N)``, one GPU per worker, no collectives).  The TPU
build adds true in-program parallelism: a ``jax.sharding.Mesh`` with
``data`` (batch) and ``model`` (tensor) axes; XLA inserts the collectives
over ICI.
"""

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=(D, M)``: D-way data parallel × M-way model parallel.  Default
    is all-data-parallel (D=#devices, M=1).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    d, m = shape
    if d * m != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    arr = np.asarray(devices).reshape(d, m)
    return Mesh(arr, axis_names=tuple(axis_names))


def default_mesh() -> Mesh:
    return create_mesh()
