"""Small shared helpers (reference vocabulary: /root/reference/marie/helper.py)."""

import asyncio
import functools
import os
import random
import socket
import threading
import time
import uuid
from typing import Any, Iterable, Iterator, List, Optional, Sequence, TypeVar

T = TypeVar("T")

_RANDOM_PORT_MIN = 49153
_RANDOM_PORT_MAX = 65535
_assigned_ports: set = set()
_port_lock = threading.Lock()


def random_identity() -> str:
    return uuid.uuid4().hex


def default_bind_host() -> str:
    """Default listen address for every server: loopback unless the
    operator opts into wider exposure via ``MARIE_BIND_HOST`` (e.g.
    ``0.0.0.0`` inside a container). The reference binds 0.0.0.0 but
    gates requests with API keys; here the safe-by-default bind keeps
    unauthenticated dev servers off the network."""
    return os.environ.get("MARIE_BIND_HOST", "127.0.0.1")


def random_port() -> int:
    """Pick a free TCP port on localhost, avoiding ports handed out earlier
    in this process (reference: marie/helper.py random_port)."""
    with _port_lock:
        for _ in range(200):
            port = random.randint(_RANDOM_PORT_MIN, _RANDOM_PORT_MAX)
            if port in _assigned_ports:
                continue
            with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
                try:
                    s.bind(("", port))
                except OSError:
                    continue
            _assigned_ports.add(port)
            return port
    raise OSError("could not find a free port")


def is_port_free(host: str, port: int) -> bool:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        try:
            s.bind((host, port))
            return True
        except OSError:
            return False


def get_or_reuse_loop() -> asyncio.AbstractEventLoop:
    """Get the running event loop or create a fresh one for this thread."""
    try:
        return asyncio.get_running_loop()
    except RuntimeError:
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        return loop


def run_async(coro):
    """Run a coroutine from sync code, even if a loop is already running
    in another thread."""
    try:
        asyncio.get_running_loop()
    except RuntimeError:
        return asyncio.run(coro)
    # we're inside a loop — run in a side thread
    result: List[Any] = []
    error: List[BaseException] = []

    def _target():
        try:
            result.append(asyncio.run(coro))
        except BaseException as e:  # noqa: BLE001
            error.append(e)

    t = threading.Thread(target=_target, daemon=True)
    t.start()
    t.join()
    if error:
        raise error[0]
    return result[0]


def batch_iterator(data: Sequence[T], batch_size: int) -> Iterator[List[T]]:
    """Yield fixed-size chunks (reference: marie/helper.py batch_iterator)."""
    if batch_size <= 0:
        yield list(data)
        return
    for i in range(0, len(data), batch_size):
        yield list(data[i : i + batch_size])


def typename(obj: Any) -> str:
    if isinstance(obj, type):
        return f"{obj.__module__}.{obj.__name__}"
    return f"{type(obj).__module__}.{type(obj).__name__}"


def countdown(t: float, reason: str = "") -> None:
    time.sleep(t)


class cached_property:  # noqa: N801 — mirrors functools style
    """Property computed once per instance."""

    def __init__(self, func):
        self.func = func
        functools.update_wrapper(self, func)

    def __get__(self, obj, cls=None):
        if obj is None:
            return self
        val = self.func(obj)
        obj.__dict__[self.func.__name__] = val
        return val


def ensure_exists(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def deprecate_by(new_fn, old_name: str):
    def _wrapper(*args, **kwargs):
        import warnings

        warnings.warn(
            f"{old_name} is deprecated, use {new_fn.__name__}",
            DeprecationWarning,
            stacklevel=2,
        )
        return new_fn(*args, **kwargs)

    return _wrapper


def parse_host(host: str) -> str:
    return host.replace("localhost", "127.0.0.1")


def get_full_version() -> dict:
    """Version table for diagnostics (reference: marie/helper.py get_full_version)."""
    import platform

    info = {
        "marie_tpu": __import__("marie_tpu").__version__,
        "python": platform.python_version(),
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["device_count"] = jax.device_count()
    except Exception:  # noqa: BLE001 — diagnostics must never fail
        info["jax"] = "unavailable"
    return info


class GatewayProgress:
    """No-op progress hook placeholder for CLI UX."""

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False

    def update(self, *a, **kw):
        pass


def slugify(value: str) -> str:
    import re

    value = re.sub(r"[^\w\-]+", "-", value.strip().lower())
    return re.sub(r"-{2,}", "-", value).strip("-")


def iterasync(it: Iterable[T]):
    """Wrap a sync iterable as an async iterator."""

    async def _gen():
        for x in it:
            yield x

    return _gen()


def format_bytes(n: float) -> str:
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(n) < 1024:
            return f"{n:.1f}{unit}"
        n /= 1024
    return f"{n:.1f}PiB"
