"""Expert parallelism over the virtual CPU mesh: all_to_all-dispatched
top-1 MoE must match the per-token dense reference (and enforce
capacity drops)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from marie_tpu.parallel.moe import make_moe_fn


def _expert_fn(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _make(rng, e, d):
    ws = jnp.asarray(rng.normal(size=(e, d, d)).astype(np.float32) * 0.3)
    bs = jnp.asarray(rng.normal(size=(e, d)).astype(np.float32) * 0.1)
    router = jnp.asarray(rng.normal(size=(d, e)).astype(np.float32))
    return (ws, bs), router


def _dense_reference(params, router, x):
    ws, bs = np.asarray(params[0]), np.asarray(params[1])
    logits = np.asarray(x) @ np.asarray(router)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    choice = probs.argmax(-1)
    out = np.zeros_like(np.asarray(x))
    for t in range(x.shape[0]):
        e = choice[t]
        out[t] = probs[t, e] * np.tanh(np.asarray(x)[t] @ ws[e] + bs[e])
    return out


@pytest.mark.parametrize("mesh_shape,axes", [
    ((8,), ("expert",)),
    ((2, 4), ("data", "expert")),
])
def test_moe_matches_dense_reference(mesh_shape, axes):
    devices = np.array(jax.devices()[: int(np.prod(mesh_shape))]).reshape(
        mesh_shape
    )
    mesh = Mesh(devices, axes)
    shape = dict(zip(axes, mesh_shape))
    e, d = shape["expert"], 16
    data = shape.get("data", 1)

    rng = np.random.default_rng(5)
    params, router = _make(rng, e, d)
    tokens = jnp.asarray(rng.normal(size=(8 * data, d)).astype(np.float32))

    # ample capacity: nothing drops, exact match with the dense loop
    fn = make_moe_fn(mesh, _expert_fn, capacity=tokens.shape[0])
    got = np.asarray(fn(params, router, tokens))
    want = _dense_reference(params, router, tokens)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_moe_capacity_drops_overflow_tokens():
    devices = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devices, ("expert",))
    d = 16
    rng = np.random.default_rng(6)
    params, router = _make(rng, 8, d)
    # force every token to the same expert: all-identical tokens
    one = rng.normal(size=(1, d)).astype(np.float32)
    tokens = jnp.asarray(np.repeat(one, 6, axis=0))

    fn = make_moe_fn(mesh, _expert_fn, capacity=2)
    got = np.asarray(fn(params, router, tokens))
    # first 2 tokens (capacity) produce output; the overflow is dropped
    assert np.abs(got[:2]).sum() > 0
    np.testing.assert_allclose(got[2:], 0.0, atol=1e-7)
