"""Pipeline parallelism over the virtual 8-device CPU mesh: the
microbatched ppermute schedule must produce EXACTLY the sequential
composition of the stages (SURVEY §2.5 slice-scale; scaling-playbook
pipeline pattern)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from marie_tpu.parallel.pipeline import make_pipelined_fn, pipeline_apply


def _stage_fn(params, x):
    w, b = params
    return jnp.tanh(x @ w + b)


def _stack_params(rng, stages, dim):
    ws = rng.normal(size=(stages, dim, dim)).astype(np.float32) * 0.3
    bs = rng.normal(size=(stages, dim)).astype(np.float32) * 0.1
    return jnp.asarray(ws), jnp.asarray(bs)


def _sequential(params, batch):
    ws, bs = params
    out = batch
    for s in range(ws.shape[0]):
        out = _stage_fn((ws[s], bs[s]), out)
    return out


@pytest.mark.parametrize("mesh_shape,axes", [
    ((8,), ("pipe",)),
    ((2, 4), ("data", "pipe")),
])
def test_pipeline_matches_sequential(mesh_shape, axes):
    devices = np.array(jax.devices()[: int(np.prod(mesh_shape))]).reshape(
        mesh_shape
    )
    mesh = Mesh(devices, axes)
    stages = dict(zip(axes, mesh_shape))["pipe"]
    data = dict(zip(axes, mesh_shape)).get("data", 1)

    rng = np.random.default_rng(3)
    params = _stack_params(rng, stages, dim=16)
    m, mb = 6 * max(data, 1), 4
    batch = jnp.asarray(
        rng.normal(size=(m, mb, 16)).astype(np.float32)
    )

    fn = make_pipelined_fn(mesh, _stage_fn)
    got = fn(params, batch)
    want = _sequential(params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_apply_schedule_depth():
    """The fori_loop runs exactly S+M-1 ticks — warmup/drain garbage
    never reaches the recorded outputs (checked by exactness above);
    here we pin the bubble accounting with a 1-stage 'pipeline' (must be
    the identity schedule)."""
    devices = np.array(jax.devices()[:1]).reshape(1)
    mesh = Mesh(devices, ("pipe",))
    rng = np.random.default_rng(0)
    params = _stack_params(rng, 1, dim=8)
    batch = jnp.asarray(rng.normal(size=(3, 2, 8)).astype(np.float32))
    fn = make_pipelined_fn(mesh, _stage_fn)
    np.testing.assert_allclose(
        np.asarray(fn(params, batch)),
        np.asarray(_sequential(params, batch)),
        atol=1e-6,
    )
