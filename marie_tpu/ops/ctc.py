"""CTC decoding — greedy collapse on device.

Used by the CRNN recognition head (reference: CTC branch of
``/root/reference/marie/models/icr/model.py`` whose decode happens on host
via ``CTCLabelConverter``).  Here the collapse (dedupe repeats, drop
blanks) runs on the TPU with static shapes; text materialisation from
token ids happens on host where strings live.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("blank_id",))
def ctc_greedy_decode(logits: jnp.ndarray, blank_id: int = 0):
    """Greedy CTC decode.

    Args:
      logits: [B, T, V] per-frame scores.
      blank_id: CTC blank token.

    Returns:
      tokens: [B, T] int32 — decoded ids, left-aligned, padded with -1.
      lengths: [B] int32 — number of emitted tokens.
      confidence: [B] float32 — mean max-prob over non-blank frames
        (the per-word confidence proxy the reference reports).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    best = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T]
    best_p = jnp.max(probs, axis=-1)  # [B, T]

    prev = jnp.pad(best[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    emit = (best != blank_id) & (best != prev)  # collapse repeats, drop blanks

    b, t = best.shape
    pos = jnp.cumsum(emit.astype(jnp.int32), axis=1) - 1  # emission slot
    tokens = jnp.full((b, t), -1, dtype=jnp.int32)
    batch_idx = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))
    write_pos = jnp.where(emit, pos, t)  # t is out of bounds → dropped
    tokens = tokens.at[batch_idx, write_pos].set(best, mode="drop")
    lengths = jnp.sum(emit, axis=1).astype(jnp.int32)

    nb = best != blank_id
    conf = jnp.sum(jnp.where(nb, best_p, 0.0), axis=1) / jnp.maximum(
        jnp.sum(nb, axis=1), 1
    )
    return tokens, lengths, conf.astype(jnp.float32)
