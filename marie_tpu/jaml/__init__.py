"""YAML object system — parity with the reference's JAML
(``/root/reference/marie/jaml/__init__.py``).

Capabilities:

* ``jtype: ClassName`` tags construct registered classes, with constructor
  kwargs under ``with:`` and metadata under ``metas:``.
* ``${{ ENV.X }}`` substitutes environment variables, ``${{ CONTEXT.x }}``
  (or bare ``${{ x }}``) substitutes entries of a caller-provided context
  dict.  A trailing ``|default`` provides a fallback:
  ``${{ ENV.PORT | 8080 }}``.
* :class:`JAMLCompatible` auto-registers subclasses by class name so YAML
  can name them; round-trip ``load_config`` / ``save_config``.
"""

import os
import re
from typing import Any, Dict, Optional, TextIO, Type, Union

import yaml

from marie_tpu.excepts import BadConfigSource

_VAR_RE = re.compile(r"\$\{\{\s*([^}]+?)\s*\}\}")


class _Registry:
    _classes: Dict[str, type] = {}

    @classmethod
    def register(cls, klass: type) -> None:
        cls._classes[klass.__name__] = klass

    @classmethod
    def get(cls, name: str) -> Optional[type]:
        return cls._classes.get(name)


from abc import ABCMeta


class JAMLCompatibleType(ABCMeta):
    """Metaclass that auto-registers every subclass for YAML construction
    (reference: marie/jaml/__init__.py:531 JAMLCompatible registration).
    Derives from ABCMeta so JAMLCompatible classes can also be ABCs."""

    def __new__(mcs, name, bases, namespace):
        klass = super().__new__(mcs, name, bases, namespace)
        _Registry.register(klass)
        return klass


class JAMLCompatible(metaclass=JAMLCompatibleType):
    """Base class for anything constructible from YAML via ``jtype``."""

    @classmethod
    def load_config(
        cls,
        source: Union[str, TextIO, Dict],
        context: Optional[Dict[str, Any]] = None,
        substitute: bool = True,
        runtime_args: Optional[Dict[str, Any]] = None,
        **extra_kwargs,
    ):
        cfg = JAML.load_config(source, context=context, substitute=substitute)
        if not isinstance(cfg, dict):
            raise BadConfigSource(f"expected a mapping at top level, got {type(cfg)}")
        obj = JAML.construct(cfg, expected_cls=cls, extra_kwargs=extra_kwargs)
        if runtime_args and hasattr(obj, "runtime_args"):
            for k, v in runtime_args.items():
                setattr(obj.runtime_args, k, v)
        return obj

    def save_config(self, path: str) -> None:
        with open(path, "w") as fp:
            yaml.safe_dump(JAML.deconstruct(self), fp, sort_keys=False)


class JAML:
    """Static facade for load/dump/substitute/construct."""

    @staticmethod
    def load(stream) -> Any:
        return yaml.safe_load(stream)

    @staticmethod
    def dump(data, stream=None) -> Optional[str]:
        return yaml.safe_dump(data, stream, sort_keys=False)

    @staticmethod
    def load_config(
        source: Union[str, TextIO, Dict],
        context: Optional[Dict[str, Any]] = None,
        substitute: bool = True,
    ) -> Any:
        if isinstance(source, dict):
            data = source
        else:
            text = None
            if hasattr(source, "read"):
                text = source.read()
            elif isinstance(source, str):
                # a path, or inline YAML (contains a newline / colon)
                if os.path.exists(source):
                    with open(source) as fp:
                        text = fp.read()
                elif "\n" in source or ":" in source:
                    text = source
                else:
                    raise BadConfigSource(f"cannot find config file: {source}")
            if text is None:
                raise BadConfigSource(f"unsupported config source {type(source)}")
            data = yaml.safe_load(text)
        if substitute:
            data = JAML.expand_dict(data, context=context)
        return data

    @staticmethod
    def expand_dict(
        data: Any, context: Optional[Dict[str, Any]] = None
    ) -> Any:
        """Recursively substitute ``${{ ... }}`` expressions."""
        context = context or {}

        def _resolve(expr: str) -> Any:
            expr = expr.strip()
            default: Any = None
            has_default = False
            if "|" in expr:
                expr, _, default = expr.partition("|")
                expr, default = expr.strip(), default.strip()
                has_default = True
            if expr.upper().startswith("ENV."):
                key = expr[4:]
                if key in os.environ:
                    return os.environ[key]
                if has_default:
                    return default
                return None
            if expr.upper().startswith("CONTEXT."):
                key = expr[8:]
            else:
                key = expr
            if key in context:
                return context[key]
            if has_default:
                return default
            return None

        def _sub(val: Any) -> Any:
            if isinstance(val, str):
                m = _VAR_RE.fullmatch(val.strip())
                if m:  # whole-string substitution: preserve native types
                    resolved = _resolve(m.group(1))
                    return _parse_scalar(resolved) if resolved is not None else None
                return _VAR_RE.sub(
                    lambda mm: str(_resolve(mm.group(1)) or ""), val
                )
            if isinstance(val, dict):
                return {k: _sub(v) for k, v in val.items()}
            if isinstance(val, list):
                return [_sub(v) for v in val]
            return val

        return _sub(data)

    @staticmethod
    def construct(
        cfg: Dict[str, Any],
        expected_cls: Optional[type] = None,
        extra_kwargs: Optional[Dict[str, Any]] = None,
    ) -> Any:
        """Build an object from a ``jtype`` mapping."""
        cfg = dict(cfg)
        jtype = cfg.pop("jtype", None)
        if jtype is None:
            if expected_cls is None:
                return cfg
            klass: Optional[type] = expected_cls
        else:
            klass = _Registry.get(jtype)
            if klass is None:
                klass = _import_by_path(jtype)
            if klass is None:
                raise BadConfigSource(f"unknown jtype: {jtype!r}")
            if (
                expected_cls is not None
                and expected_cls is not JAMLCompatible
                and not issubclass(klass, expected_cls)
            ):
                raise BadConfigSource(
                    f"jtype {jtype} is not a subclass of {expected_cls.__name__}"
                )
        with_kwargs = dict(cfg.pop("with", None) or {})
        metas = cfg.pop("metas", None) or {}
        # recursively construct nested jtype objects in `with`
        for k, v in list(with_kwargs.items()):
            if isinstance(v, dict) and "jtype" in v:
                with_kwargs[k] = JAML.construct(v)
        with_kwargs.update(extra_kwargs or {})
        obj = klass(**with_kwargs) if not hasattr(klass, "_from_yaml_config") else (
            klass._from_yaml_config(with_kwargs, metas=metas, raw=cfg)
        )
        if metas and hasattr(obj, "metas"):
            for k, v in metas.items():
                try:
                    setattr(obj.metas, k, v)
                except Exception:  # noqa: BLE001 — metas namespace may be frozen
                    pass
        return obj

    @staticmethod
    def deconstruct(obj: Any) -> Dict[str, Any]:
        """Best-effort round-trip: dump an object to a jtype mapping."""
        if hasattr(obj, "_to_yaml_config"):
            return obj._to_yaml_config()
        cfg: Dict[str, Any] = {"jtype": type(obj).__name__}
        init_kwargs = getattr(obj, "_init_kwargs_", None)
        if init_kwargs:
            cfg["with"] = dict(init_kwargs)
        return cfg

    @staticmethod
    def registered_classes() -> Dict[str, type]:
        return dict(_Registry._classes)


def _parse_scalar(v: Any) -> Any:
    if not isinstance(v, str):
        return v
    try:
        return yaml.safe_load(v)
    except Exception:  # noqa: BLE001
        return v


def _import_by_path(path: str) -> Optional[type]:
    """Resolve dotted-path jtypes like ``mypkg.mymod.MyExecutor``."""
    if "." not in path:
        return None
    mod_name, _, cls_name = path.rpartition(".")
    try:
        import importlib

        mod = importlib.import_module(mod_name)
        return getattr(mod, cls_name, None)
    except ImportError:
        return None
