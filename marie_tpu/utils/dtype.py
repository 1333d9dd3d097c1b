"""Mixed-precision helpers: bf16 inference casting.

TPU MXU throughput doubles in bfloat16; inference casts float params and
activations to bf16 while keeping softmax/normalisation accumulation in
f32 (handled inside the attention/decode kernels).
"""

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype=jnp.bfloat16):
    """Cast all float leaves of a pytree to ``dtype``."""

    def _cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(_cast, tree)
