"""Sequence-parallel attention over the virtual CPU mesh must equal
single-device attention bit-for-float."""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from marie_tpu.parallel.sequence import make_seq_attention_fn


def _reference(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("bqhd,bkhd->bhqk", q * scale, k)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", probs, v)


def test_seq_sharded_attention_matches_full():
    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("seq",))
    rng = np.random.default_rng(9)
    b, l, h, dh = 2, 32, 4, 8  # L divides the 8-way seq axis
    q, k, v = (
        rng.normal(size=(b, l, h, dh)).astype(np.float32) for _ in range(3)
    )
    fn = make_seq_attention_fn(mesh)
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, _reference(q, k, v), atol=1e-5)
