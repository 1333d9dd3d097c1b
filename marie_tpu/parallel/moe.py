"""Expert parallelism: top-1 routed mixture-of-experts with tokens
exchanged over an ``expert`` mesh axis via ``lax.all_to_all`` — the
canonical TPU EP pattern (each device owns ONE expert's weights; router
decisions move tokens to their expert's device and back, riding ICI).

Functional and shard_map-native like ``parallel/pipeline.py``; the OCR
models don't use MoE, but the scaling surface (dp/tp/pp/sp/ep) is part
of the framework contract (SURVEY §2.5) and this is the ep leg.
"""

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["moe_apply", "make_moe_fn"]


def moe_apply(
    expert_params,
    x: jnp.ndarray,
    router_w: jnp.ndarray,
    expert_fn: Callable,
    capacity: int,
    axis: str = "expert",
) -> jnp.ndarray:
    """Top-1 MoE inside ``shard_map``: ``x`` is this device's local
    tokens ``[T, D]``, ``expert_params`` is THIS device's expert,
    ``router_w`` ``[D, E]`` is replicated.  Tokens beyond ``capacity``
    per (device, expert) pair are dropped (standard capacity-factor
    semantics); returns ``[T, D]`` with each surviving token scaled by
    its router probability.
    """
    e_count = lax.axis_size(axis)
    t, d = x.shape

    logits = x @ router_w  # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    choice = jnp.argmax(probs, axis=-1)  # [T]
    gate = jnp.take_along_axis(probs, choice[:, None], axis=1)[:, 0]  # [T]

    # position of each token within its chosen expert's capacity buffer
    onehot = jax.nn.one_hot(choice, e_count, dtype=jnp.int32)  # [T, E]
    pos = jnp.cumsum(onehot, axis=0) * onehot - 1  # [T, E], -1 where unrouted
    slot = jnp.sum(pos * onehot, axis=1)  # [T]
    keep = (slot >= 0) & (slot < capacity)

    # dispatch buffer: send[e, c, :] = the token routed to expert e at
    # capacity slot c (zeros where empty)
    disp = (
        jax.nn.one_hot(choice, e_count, dtype=x.dtype)[:, :, None]
        * jax.nn.one_hot(jnp.clip(slot, 0, capacity - 1), capacity, dtype=x.dtype)[:, None, :]
        * keep[:, None, None].astype(x.dtype)
    )  # [T, E, C]
    send = jnp.einsum("tec,td->ecd", disp, x)  # [E, C, D]

    # exchange: after all_to_all over the expert axis, THIS device holds
    # its own expert's tokens from every peer: [E_src, C, D]
    recv = lax.all_to_all(send, axis, split_axis=0, concat_axis=0, tiled=True)
    hidden = expert_fn(expert_params, recv.reshape(e_count * capacity, d))
    hidden = hidden.reshape(e_count, capacity, d)

    # send results home and combine back into token order
    back = lax.all_to_all(hidden, axis, split_axis=0, concat_axis=0, tiled=True)
    out = jnp.einsum("tec,ecd->td", disp, back)
    return out * gate[:, None]


def make_moe_fn(
    mesh: Mesh,
    expert_fn: Callable,
    capacity: int,
    expert_axis: str = "expert",
    data_axis: str = "data",
):
    """Jitted ``fn(stacked_expert_params, router_w, x) -> y`` sharding
    experts over ``expert_axis`` (one expert per device along the axis)
    and tokens over ``data_axis`` when present."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    axes = dict(mesh.shape)
    has_data = data_axis in axes and axes[data_axis] > 1
    p_experts = P(expert_axis)
    p_tokens = P(data_axis) if has_data else P()

    def spmd(params, router_w, x):
        local = jax.tree_util.tree_map(lambda v: v[0], params)
        return moe_apply(
            local, x, router_w, expert_fn, capacity, axis=expert_axis
        )

    kwargs = dict(
        mesh=mesh,
        in_specs=(p_experts, P(), p_tokens),
        out_specs=p_tokens,
    )
    try:
        fn = shard_map(spmd, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        fn = shard_map(spmd, check_rep=False, **kwargs)
    return jax.jit(fn)
