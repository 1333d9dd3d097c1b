"""AOT-serialized executable store (VERDICT r3 #6 — kill cold start).

The persistent HLO compile cache (:mod:`marie_tpu.utils.jax_cache`)
already makes every program a one-compile cost, but a cold server still
pays per-program executable LOAD through the device link (BENCH_r03:
712 s to warm 68 cached programs).  This module stores fully-compiled
executables (``jax.experimental.serialize_executable``) keyed by
(program name, abstract arg shapes, device kind, topology, jaxlib
version) so a serving process can

  * ``load_or_compile(name, fn, args)`` — deserialize a pinned
    executable when one matches, else compile once and save it;
  * pre-warm at ``marie server --start`` (serve boot calls
    :func:`prewarm`) so the FIRST request never pays load/compile.

The store lives in ``program_zoo/`` next to ``model_zoo/`` by default
(override with ``MARIE_PROGRAM_ZOO``); entries are ``<key>.jexec``
pickles.  A stale entry (different jaxlib/device) misses by key, never
by failure: deserialization errors fall back to compile+save.
"""

import hashlib
import os
import pickle
from typing import Any, Callable, Optional, Tuple

from marie_tpu.logging_core import MarieLogger

logger = MarieLogger("program-zoo")

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "program_zoo",
)


def zoo_dir() -> str:
    return os.environ.get("MARIE_PROGRAM_ZOO", _DEFAULT_DIR)


def _device_fingerprint() -> str:
    import jax

    dev = jax.devices()[0]
    return (
        f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
        f":n{jax.device_count()}:jaxlib{jax.__version__}"
    )


def _abstractify(tree) -> str:
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    return ";".join(
        f"{getattr(x, 'shape', ())}/{getattr(x, 'dtype', type(x).__name__)}"
        f"/{getattr(x, 'sharding', '')}"
        for x in leaves
    )


def key_for(name: str, args: Tuple[Any, ...], static: str = "") -> str:
    """Content key: program name + arg avals + static config + device
    fingerprint.  Anything that changes the compiled artifact must be in
    here — a wrong hit would run the wrong program."""
    h = hashlib.sha256()
    h.update(name.encode())
    h.update(_abstractify(args).encode())
    h.update(static.encode())
    h.update(_device_fingerprint().encode())
    return f"{name}-{h.hexdigest()[:20]}"


def _path(key: str) -> str:
    return os.path.join(zoo_dir(), f"{key}.jexec")


def _compiled_device_ids(compiled) -> list:
    """Device ids the executable was compiled for (from its input/output
    shardings) — deserialize_and_load defaults to ALL local devices,
    which mis-loads a single-device program on a multi-device host."""
    ids = set()
    try:
        ins, _kw = compiled.input_shardings
        for s in list(ins) + list(compiled.output_shardings):
            for d in getattr(s, "device_set", []) or []:
                ids.add(d.id)
    except Exception:  # noqa: BLE001 — sharding introspection best-effort
        pass
    return sorted(ids) or [0]


def save_compiled(key: str, compiled) -> bool:
    """Serialize a ``jax.stages.Compiled`` to the zoo (best-effort)."""
    try:
        from jax.experimental import serialize_executable as se

        payload = se.serialize(compiled)
        record = {
            "payload": payload,
            "device_ids": _compiled_device_ids(compiled),
        }
        os.makedirs(zoo_dir(), exist_ok=True)
        tmp = _path(key) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(record, f)
        os.replace(tmp, _path(key))
        return True
    except Exception as ex:  # noqa: BLE001 — AOT store is an accelerator
        logger.warning(f"save_compiled({key}) failed: {ex!r}")
        return False


def load_compiled(key: str):
    """Deserialize a previously-saved executable, or None on any miss."""
    path = _path(key)
    if not os.path.exists(path):
        return None
    try:
        import jax
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            record = pickle.load(f)
        by_id = {d.id: d for d in jax.devices()}
        devices = [by_id[i] for i in record["device_ids"]]
        return se.deserialize_and_load(
            *record["payload"], execution_devices=devices
        )
    except Exception as ex:  # noqa: BLE001 — stale/foreign entry
        logger.warning(f"load_compiled({key}) failed: {ex!r}")
        return None


def load_or_compile(
    name: str,
    jitted: Callable,
    args: Tuple[Any, ...],
    static: str = "",
    save: bool = True,
):
    """Return a compiled executable for ``jitted(*args)``: zoo hit when
    one matches, else ``jitted.lower(*args).compile()`` (hitting the
    persistent HLO cache) and save.  ``jitted`` must be a ``jax.jit``
    -wrapped callable."""
    key = key_for(name, args, static)
    compiled = load_compiled(key)
    if compiled is not None:
        logger.debug(f"program zoo hit: {key}")
        return compiled
    compiled = jitted.lower(*args).compile()
    if save:
        save_compiled(key, compiled)
    return compiled


_MEMO: dict = {}
_ENABLED: Optional[bool] = None


def _zoo_enabled() -> bool:
    """AOT store gate — explicit opt-in (``MARIE_PROGRAM_ZOO_ENABLE=1``).

    Round-5 measurements (scripts/probe_zoo.py, on-chip): serialize
    works on the real serving executables (psize=16 fused: 99 MB entry,
    deserialize+load 2.7 s vs 34 s compile+load) and outputs match the
    plain-jit path on CPU (tests/unit/test_program_zoo.py) and for the
    mid-size on-chip probe.  It stays opt-in on this relay backend
    because device-loading the 60-100 MB entries rides the same flaky
    RPC path as compiles — in a degraded window (695 s cold page
    measured) a big .jexec load is no faster than a cache-hit compile,
    and the fallback costs an extra attempt.  On directly-attached TPU
    hardware flip it on: loads are local-disk + PCIe.
    """
    global _ENABLED
    if _ENABLED is None:
        env = os.environ.get("MARIE_PROGRAM_ZOO_ENABLE")
        if env is None:
            return False
        _ENABLED = env not in ("", "0", "false", "no")
    return _ENABLED


def zoo_call(
    name: str,
    jitted: Callable,
    all_args: Tuple[Any, ...],
    dynamic_idx: Tuple[int, ...],
    static_repr: str = "",
):
    """Serving-path entry: execute ``jitted(*all_args)`` through an
    AOT-pinned executable when possible.

    ``dynamic_idx`` names the positions of the NON-static arguments (a
    ``jax.stages.Compiled`` is called with dynamic args only).  Process
    memo -> zoo deserialize (0.01 s on-chip for a probe program) ->
    compile via the persistent HLO cache (+save).  Any failure falls
    back to the plain jit call.

    Default: ON for TPU processes, OFF for CPU (keeps test runs from
    piling .jexec entries); ``MARIE_PROGRAM_ZOO_ENABLE=1/0`` overrides
    both ways.  History: in round 4 serializing the real fused
    executable produced no zoo entry on the axon relay and the explicit
    lower/compile path measured far slower than plain jit in the same
    window — round 5 re-probed (scripts/probe_zoo.py): deserialize+load
    0.02 s vs 0.99 s cache-hit compile with exec-output match on the
    real serving executables, so the zoo is now the TPU default.  The
    CPU/direct-TPU round trip is proven by tests/unit/test_program_zoo.py.
    """
    if not _zoo_enabled():
        return jitted(*all_args)
    memo_key = None
    try:
        dyn = tuple(all_args[i] for i in dynamic_idx)
        memo_key = (name, static_repr, _abstractify(dyn))
        compiled = _MEMO.get(memo_key)
        if compiled is None:
            key = key_for(name, dyn, static=static_repr)
            compiled = load_compiled(key)
            if compiled is None:
                compiled = jitted.lower(*all_args).compile()
                save_compiled(key, compiled)
            _MEMO[memo_key] = compiled
        return compiled(*dyn)
    except Exception as ex:  # noqa: BLE001 — never fail the serving path
        logger.warning(f"zoo_call({name}) fell back to jit: {ex!r}")
        _MEMO.pop(memo_key, None)
        return jitted(*all_args)


def prewarm(fns: Optional[dict] = None) -> int:
    """Eagerly deserialize every zoo entry for this device fingerprint's
    prefix — used by server boot so request paths find hot executables.
    Returns the number of entries touched (load failures are skipped)."""
    n = 0
    d = zoo_dir()
    if not os.path.isdir(d):
        return 0
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".jexec"):
            continue
        if load_compiled(fname[: -len(".jexec")]) is not None:
            n += 1
    return n
