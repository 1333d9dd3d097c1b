"""Test configuration.

Tests run on CPU with a virtual 8-device topology so sharding/pjit paths
are exercised without TPU hardware (mirrors the reference's strategy of
spawning real runtimes locally, SURVEY.md §4).

This environment pre-imports jax with a TPU backend registered via
sitecustomize, so env vars alone are too late — we must also flip
``jax.config`` after import.
"""

import asyncio
import inspect
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("MARIE_LOG_LEVEL", "WARNING")
# spawned pod subprocesses inherit this and pick CPU at their own jax
# import.  HARD set (not setdefault): the session shell may export
# JAX_PLATFORMS=axon, and a pod inheriting the accelerator platform
# hangs executor startup whenever the relay is unreachable — the test
# suite is CPU-by-design (SURVEY §4) regardless of ambient env.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_pyfunc_call(pyfuncitem):
    """Minimal asyncio support (pytest-asyncio is not available here)."""
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None


@pytest.fixture
def port_generator():
    from marie_tpu.helper import random_port

    return random_port


@pytest.fixture
def tmp_workspace(tmp_path):
    ws = tmp_path / "workspace"
    ws.mkdir()
    return str(ws)


@pytest.fixture(scope="session")
def cpu_mesh_devices():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "tests expect 8 virtual CPU devices"
    return devs
