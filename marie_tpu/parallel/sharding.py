"""Sharding rules: parameter and batch placement on the mesh.

Scaling-book recipe: annotate shardings, let XLA insert collectives.
Parameters get tensor-parallel sharding over the ``model`` axis by a
shape heuristic (large matrices shard their last dim — MLP/attention
projections); batches shard over ``data``.
"""

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def infer_param_sharding(
    params: Any, mesh: Mesh, model_axis: str = "model", min_size: int = 2**14
):
    """Pytree of NamedShardings for a param tree.

    Leaves with ndim>=2 whose last dim divides the model-axis size and are
    big enough get ``P(..., model_axis)``; everything else is replicated.
    """
    m = mesh.shape[model_axis]

    def rule(leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.size >= min_size
            and m > 1
            and leaf.shape[-1] % m == 0
        ):
            spec = P(*([None] * (leaf.ndim - 1) + [model_axis]))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(rule, params)


def shard_batch(mesh: Mesh, data_axis: str = "data"):
    """NamedSharding factory: batch-dim sharded over the data axis."""

    def rule(leaf):
        ndim = leaf.ndim if hasattr(leaf, "ndim") else 0
        spec = P(*([data_axis] + [None] * (ndim - 1))) if ndim else P()
        return NamedSharding(mesh, spec)

    return rule


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
