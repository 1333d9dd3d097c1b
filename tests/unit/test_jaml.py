import os

import pytest

from marie_tpu.jaml import JAML, JAMLCompatible


class DummyEncoder(JAMLCompatible):
    def __init__(self, dim: int = 16, name: str = "enc"):
        self.dim = dim
        self.name = name


def test_env_substitution(monkeypatch):
    monkeypatch.setenv("MARIE_TEST_PORT", "8080")
    cfg = JAML.load_config("port: ${{ ENV.MARIE_TEST_PORT }}\n")
    assert cfg["port"] == 8080  # native int, not str


def test_env_default():
    os.environ.pop("MARIE_NOPE", None)
    cfg = JAML.load_config("port: ${{ ENV.MARIE_NOPE | 9090 }}\n")
    assert cfg["port"] == 9090


def test_context_substitution():
    cfg = JAML.load_config(
        "name: ${{ CONTEXT.name }}\nnested: {v: 'prefix-${{ name }}-suffix'}\n",
        context={"name": "abc"},
    )
    assert cfg["name"] == "abc"
    assert cfg["nested"]["v"] == "prefix-abc-suffix"


def test_jtype_construct():
    obj = JAML.construct({"jtype": "DummyEncoder", "with": {"dim": 32}})
    assert isinstance(obj, DummyEncoder)
    assert obj.dim == 32
    assert obj.name == "enc"


def test_jtype_nested_construct():
    class Outer(JAMLCompatible):
        def __init__(self, inner=None):
            self.inner = inner

    obj = JAML.construct(
        {"jtype": "Outer", "with": {"inner": {"jtype": "DummyEncoder", "with": {"dim": 8}}}}
    )
    assert isinstance(obj.inner, DummyEncoder)
    assert obj.inner.dim == 8


def test_load_config_classmethod():
    obj = DummyEncoder.load_config("jtype: DummyEncoder\nwith:\n  dim: 64\n")
    assert isinstance(obj, DummyEncoder)
    assert obj.dim == 64


def test_unknown_jtype_raises():
    from marie_tpu.excepts import BadConfigSource

    with pytest.raises(BadConfigSource):
        JAML.construct({"jtype": "DoesNotExist"})


def test_missing_env_without_default_is_none():
    """Unset vars resolve to None unless a `| default` is given — the
    documented contract (module docstring), pinned here."""
    from marie_tpu.jaml import JAML

    cfg = JAML.load_config("key: ${{ ENV.MARIE_DEFINITELY_UNSET_VAR_42 }}\n")
    assert cfg["key"] is None
    cfg = JAML.load_config(
        "key: ${{ ENV.MARIE_DEFINITELY_UNSET_VAR_42 | 7777 }}\n"
    )
    assert cfg["key"] in (7777, "7777")


def test_context_missing_key_is_none():
    from marie_tpu.jaml import JAML

    assert JAML.load_config("k: ${{ CONTEXT.nope }}\n", context={})["k"] is None


def test_substitution_inside_lists_and_nested_maps(monkeypatch):
    from marie_tpu.jaml import JAML

    monkeypatch.setenv("MARIE_T_PORT", "5123")
    cfg = JAML.load_config(
        "servers:\n"
        "  - host: a\n"
        "    port: ${{ ENV.MARIE_T_PORT }}\n"
        "  - host: b\n"
        "meta:\n"
        "  inner:\n"
        "    v: ${{ CONTEXT.tag }}\n",
        context={"tag": "blue"},
    )
    assert cfg["servers"][0]["port"] in (5123, "5123")
    assert cfg["meta"]["inner"]["v"] == "blue"


def test_malformed_yaml_raises_cleanly():
    import pytest

    from marie_tpu.jaml import JAML

    with pytest.raises(Exception) as exc_info:
        JAML.load_config("key: [unclosed\n  - broken")
    assert "jtype" not in repr(exc_info.value)  # parse error, not construct error
