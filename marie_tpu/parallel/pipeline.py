"""Pipeline parallelism: GPipe-style microbatched stage execution over a
mesh axis, activations rotated with ``lax.ppermute`` (ICI neighbor
exchange — the canonical TPU pipeline pattern from the scaling
playbook).

The reference scales across GPUs with replica/shard processes only; on
TPU a deep model's layers are instead SPLIT across a ``pipe`` mesh axis:
device ``s`` owns stage ``s``'s parameters, microbatches flow through
the stages in a systolic schedule of ``S + M - 1`` ticks (S stages, M
microbatches), and each tick every device computes its stage then hands
its activations to the neighbor — all inside ONE jitted program.

Composable with data parallelism: lay out a ``(data, pipe)`` mesh and
shard the global batch over ``data`` while each data-replica pipelines
over ``pipe`` (see tests/unit/test_pipeline_parallel.py).
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["pipeline_apply", "make_pipelined_fn"]


def pipeline_apply(
    stage_params,
    microbatches: jnp.ndarray,
    stage_fn: Callable,
    axis: str = "pipe",
) -> jnp.ndarray:
    """Run ``stage_fn`` as a pipeline over mesh axis ``axis``.

    MUST be called inside ``shard_map`` (or an equivalent SPMD context)
    where ``stage_params`` is the per-device slice holding THIS stage's
    parameters and ``microbatches`` is ``[M, ...]`` with the real inputs
    resident on stage 0 (other stages' copies are ignored).

    Returns ``[M, ...]`` outputs, replicated to every stage via a masked
    ``psum`` at the end (cheap: one collective over the final tensor).
    """
    s_count = lax.axis_size(axis)
    stage = lax.axis_index(axis)
    m_count = microbatches.shape[0]

    def tick(t, carry):
        cur, outs = carry
        # stage 0 injects microbatch t while t < M; later stages consume
        # the neighbor's activations from the previous tick
        inj = lax.dynamic_index_in_dim(
            microbatches, jnp.clip(t, 0, m_count - 1), 0, keepdims=False
        )
        x_in = jnp.where(stage == 0, inj, cur)
        y = stage_fn(stage_params, x_in)
        # the last stage finishes microbatch (t - S + 1) at tick t
        slot = t - (s_count - 1)
        record = (stage == s_count - 1) & (slot >= 0) & (slot < m_count)
        outs = lax.cond(
            record,
            lambda o: lax.dynamic_update_index_in_dim(
                o, y, jnp.clip(slot, 0, m_count - 1), 0
            ),
            lambda o: o,
            outs,
        )
        # rotate activations one stage forward (ICI neighbor exchange)
        nxt = lax.ppermute(
            y, axis, [(i, (i + 1) % s_count) for i in range(s_count)]
        )
        return nxt, outs

    cur0 = jnp.zeros_like(microbatches[0])
    outs0 = jnp.zeros_like(microbatches)
    _, outs = lax.fori_loop(0, s_count + m_count - 1, tick, (cur0, outs0))
    # replicate the last stage's outputs to every stage
    return lax.psum(jnp.where(stage == s_count - 1, outs, 0.0), axis)


def make_pipelined_fn(
    mesh: Mesh,
    stage_fn: Callable,
    pipe_axis: str = "pipe",
    data_axis: str = "data",
):
    """Build a jitted ``fn(stacked_stage_params, batch) -> out`` that
    pipelines ``stage_fn`` over ``pipe_axis`` and (when the mesh has a
    ``data_axis``) data-parallelizes the microbatch dimension.

    ``stacked_stage_params``: pytree whose leaves carry a leading stage
    dimension of size ``mesh.shape[pipe_axis]`` (stage s's slice goes to
    the devices at pipe index s).  ``batch``: ``[M, mb, ...]``
    microbatches.
    """
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover — older jax
        from jax.experimental.shard_map import shard_map

    axes = dict(mesh.shape)
    has_data = data_axis in axes and axes[data_axis] > 1

    # prefix specs: every params leaf shards its leading (stage) dim over
    # pipe; the microbatch tensor shards its leading dim over data
    p_params = P(pipe_axis)
    p_batch = P(data_axis) if has_data else P()

    def spmd(params, batch):
        # params leaves arrive as [1, ...] per-stage slices — drop the
        # stage dim inside the shard
        local = jax.tree_util.tree_map(lambda x: x[0], params)
        return pipeline_apply(local, batch, stage_fn, axis=pipe_axis)

    kwargs = dict(
        mesh=mesh, in_specs=(p_params, p_batch), out_specs=p_batch
    )
    try:
        fn = shard_map(spmd, check_vma=False, **kwargs)  # jax >= 0.8
    except TypeError:  # pragma: no cover — older jax spells it check_rep
        fn = shard_map(spmd, check_rep=False, **kwargs)
    return jax.jit(fn)
