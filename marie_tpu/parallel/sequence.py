"""Sequence parallelism: attention with the QUERY sequence sharded over
a ``seq`` mesh axis and K/V gathered once per block (``all_gather``
riding ICI) — the standard long-context TPU layout when one device
can't hold a full page/window stack's activations.

Each device computes attention for its contiguous query block against
the full key/value sequence; outputs stay sequence-sharded, so the
downstream (token-wise) MLP needs no re-layout.  sp leg of the
framework's scaling surface (SURVEY §2.5) next to dp/tp (train step),
pp (parallel/pipeline.py) and ep (parallel/moe.py).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["seq_sharded_attention", "make_seq_attention_fn"]


def seq_sharded_attention(
    q: jnp.ndarray,  # [B, Lq_local, H, Dh]  (sequence-sharded)
    k: jnp.ndarray,  # [B, Lk_local, H, Dh]  (sequence-sharded)
    v: jnp.ndarray,  # [B, Lk_local, H, Dh]
    axis: str = "seq",
) -> jnp.ndarray:
    """Inside shard_map: gather K/V across the seq axis, attend the local
    query block against the full sequence.  Returns [B, Lq_local, H, Dh]
    (still sequence-sharded)."""
    k_full = lax.all_gather(k, axis, axis=1, tiled=True)  # [B, Lk, H, Dh]
    v_full = lax.all_gather(v, axis, axis=1, tiled=True)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k_full)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v_full)


def make_seq_attention_fn(mesh: Mesh, seq_axis: str = "seq"):
    """Jitted sequence-sharded attention over ``mesh``: q/k/v arrive
    ``[B, L, H, Dh]`` sharded on dim 1."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    spec = P(None, seq_axis)

    def spmd(q, k, v):
        return seq_sharded_attention(q, k, v, axis=seq_axis)

    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    try:
        fn = shard_map(spmd, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover
        fn = shard_map(spmd, check_rep=False, **kwargs)
    return jax.jit(fn)
