"""AOT executable store: serialize/deserialize round trip, key
discrimination, fallback-to-compile (VERDICT r3 #6)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def zoo(tmp_path, monkeypatch):
    monkeypatch.setenv("MARIE_PROGRAM_ZOO", str(tmp_path))
    from marie_tpu.utils import program_zoo

    return program_zoo


def test_round_trip_and_hit(zoo, tmp_path):
    f = jax.jit(lambda x, y: (x @ y).sum(axis=1))
    a, b = jnp.ones((8, 16)), jnp.ones((16, 4))
    c1 = zoo.load_or_compile("matsum", f, (a, b))
    ref = np.asarray(c1(a, b))
    assert len(os.listdir(tmp_path)) == 1
    c2 = zoo.load_or_compile("matsum", f, (a, b))  # zoo hit
    assert np.allclose(np.asarray(c2(a, b)), ref)
    assert len(os.listdir(tmp_path)) == 1


def test_key_discriminates_shapes_and_static(zoo, tmp_path):
    f = jax.jit(lambda x: x * 2)
    k1 = zoo.key_for("p", (jnp.ones((4,)),))
    k2 = zoo.key_for("p", (jnp.ones((8,)),))
    k3 = zoo.key_for("p", (jnp.ones((4,)),), static="variant=2")
    assert len({k1, k2, k3}) == 3
    zoo.load_or_compile("p", f, (jnp.ones((4,)),))
    zoo.load_or_compile("p", f, (jnp.ones((8,)),))
    assert len(os.listdir(tmp_path)) == 2


def test_corrupt_entry_falls_back_to_compile(zoo, tmp_path):
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((3,))
    key = zoo.key_for("inc", (x,))
    os.makedirs(tmp_path, exist_ok=True)
    with open(tmp_path / f"{key}.jexec", "wb") as fh:
        fh.write(b"not a pickle")
    c = zoo.load_or_compile("inc", f, (x,))
    assert np.allclose(np.asarray(c(x)), 1.0)


def test_prewarm_counts_loadable_entries(zoo, tmp_path):
    f = jax.jit(lambda x: x - 1)
    zoo.load_or_compile("dec", f, (jnp.zeros((2,)),))
    assert zoo.prewarm() == 1
