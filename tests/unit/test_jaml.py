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
