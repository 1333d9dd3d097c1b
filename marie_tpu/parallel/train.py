"""Sharded training step (fine-tuning the recognizer / layout heads).

The reference has no training loop in-repo (models ship pre-trained);
the TPU build provides one because fine-tuning on-TPU is how weights get
produced here.  The step is a single ``jit`` with explicit in/out
shardings: dp over ``data``, tp over ``model`` (from
:func:`marie_tpu.parallel.sharding.infer_param_sharding`) — XLA inserts
psum/all-gather over ICI.
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from marie_tpu.parallel.sharding import infer_param_sharding, replicated, shard_batch


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray, pad_id: int) -> jnp.ndarray:
    """Masked token cross entropy. logits [B,L,V], targets [B,L]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = (targets != pad_id).astype(jnp.float32)
    return -(ll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def make_train_step(
    model,
    mesh,
    optimizer: Optional[optax.GradientTransformation] = None,
    pad_id: int = 2,
) -> Tuple[Callable, Callable]:
    """Build (init_fn, step_fn) for TrOCR-style seq2seq training.

    init_fn(rng, images, tokens) -> (params, opt_state) placed on the mesh.
    step_fn(params, opt_state, images, tokens) -> (params, opt_state, loss);
    one compiled program with dp+tp shardings.
    """
    optimizer = optimizer or optax.adamw(1e-4)

    def loss_fn(params, images, tokens):
        # teacher forcing: inputs tokens[:, :-1] predict tokens[:, 1:]
        logits = model.apply(params, images, tokens[:, :-1])
        return cross_entropy_loss(logits, tokens[:, 1:], pad_id)

    def init_fn(rng, images, tokens):
        params = model.init(rng, images, tokens[:, :-1])
        p_shard = infer_param_sharding(params, mesh)
        params = jax.device_put(params, p_shard)
        # jit propagates the input shardings into the optimizer state
        opt_state = jax.jit(optimizer.init)(params)
        return params, opt_state

    @jax.jit
    def step_fn(params, opt_state, images, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def place_batch(images, tokens):
        rule = shard_batch(mesh)
        return (
            jax.device_put(images, rule(images)),
            jax.device_put(tokens, rule(tokens)),
        )

    step_fn.place_batch = place_batch  # type: ignore[attr-defined]
    return init_fn, step_fn
