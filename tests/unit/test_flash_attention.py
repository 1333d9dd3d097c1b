import numpy as np
import pytest

import jax.numpy as jnp

from marie_tpu.ops.pallas.flash_attention import (
    _attention_reference,
    flash_attention,
)


def _rand(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.array(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_interpret_matches_reference(causal):
    b, h, s, d = 2, 2, 128, 128
    q = _rand((b, h, s, d), 0) * 0.1
    k = _rand((b, h, s, d), 1) * 0.1
    v = _rand((b, h, s, d), 2)
    got = flash_attention(q, k, v, causal=causal, interpret=True)
    want = _attention_reference(q, k, v, causal=causal, sm_scale=1.0 / d**0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_attention_kv_length_mask():
    b, h, s, d = 2, 1, 128, 128
    q = _rand((b, h, s, d), 3) * 0.1
    k = _rand((b, h, s, d), 4) * 0.1
    v = _rand((b, h, s, d), 5)
    kv_len = jnp.array([128, 64], jnp.int32)
    got = flash_attention(q, k, v, kv_len=kv_len, interpret=True)
    want = _attention_reference(q, k, v, kv_len=kv_len, sm_scale=1.0 / d**0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_flash_attention_fallback_on_untiled_shapes():
    # d=64 is below the 128-lane tile: should silently fall back to the
    # reference path and still be correct.
    b, h, s, d = 1, 2, 37, 64
    q = _rand((b, h, s, d), 6) * 0.1
    k = _rand((b, h, s, d), 7) * 0.1
    v = _rand((b, h, s, d), 8)
    got = flash_attention(q, k, v)
    want = _attention_reference(q, k, v, sm_scale=1.0 / d**0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)
