"""Small util-surface parity (reference marie/utils/{resize_image,
base64,backoff,merger}.py)."""

import numpy as np
import pytest

from marie_tpu.utils.backoff import BACKOFF_MAX_RETRIES, backoff, backoff_delay_generator
from marie_tpu.utils.codec import (
    base64_to_bytes,
    base64_to_image,
    encode_to_base64,
)
from marie_tpu.utils.merger import deep_merge_dicts, merge_dicts
from marie_tpu.utils.resize_image import resize_image, resize_image_progressive


def test_resize_image_pads_and_reports_placement():
    img = np.full((50, 100, 3), 7, np.uint8)
    out, (x, y, w, h) = resize_image(img, (200, 200))
    assert out.shape == (200, 200, 3)
    assert (w, h) == (100, 50)
    # content centered, padding is the fill color
    assert (out[y:y + h, x:x + w] == 7).all()
    assert (out[0, 0] == 255).all()


def test_resize_image_shrinks_oversize_keeping_aspect():
    img = np.zeros((400, 100), np.uint8)
    out, (x, y, w, h) = resize_image(img, (200, 200), color=(0,))
    assert out.shape == (200, 200)
    assert h == 200 and w == 50  # ratio min(200/400, 200/100) = 0.5


def test_resize_image_noop_when_exact():
    img = np.zeros((64, 64, 3), np.uint8)
    out, box = resize_image(img, (64, 64))
    assert out is img and box == (0, 0, 64, 64)


def test_resize_progressive_hits_target_and_returns_states():
    img = np.random.default_rng(0).integers(0, 255, (100, 80), np.uint8)
    out, states = resize_image_progressive(
        img, 0.5, reductions=2, return_intermediate_states=True
    )
    assert out.shape == (50, 40)
    assert len(states) == 2 and states[0].shape[0] > out.shape[0]


def test_base64_roundtrip_image_and_bytes():
    img = np.random.default_rng(1).integers(0, 255, (16, 16, 3), np.uint8)
    text = encode_to_base64(img)
    back = base64_to_image(text)
    assert (back == img).all()
    assert base64_to_bytes(None) == b""
    assert base64_to_bytes("aGk=") == b"hi"


def test_backoff_retries_then_succeeds():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise TimeoutError("not yet")
        return "ok"

    assert backoff(flaky, (TimeoutError,), sleep=sleeps.append) == "ok"
    assert sleeps == [0.1, 0.2]  # doubling generator


def test_backoff_exhausts_and_reraises():
    def always():
        raise ValueError("nope")

    with pytest.raises(ValueError):
        backoff(always, (ValueError,), max_retries=2, sleep=lambda s: None)


def test_backoff_does_not_catch_unlisted():
    def boom():
        raise KeyError("x")

    with pytest.raises(KeyError):
        backoff(boom, (ValueError,), sleep=lambda s: None)


def test_backoff_default_budget():
    n = {"c": 0}

    def count():
        n["c"] += 1
        raise OSError()

    with pytest.raises(OSError):
        backoff(count, (OSError,), sleep=lambda s: None)
    assert n["c"] == BACKOFF_MAX_RETRIES + 1


def test_delay_generator_doubles():
    g = backoff_delay_generator()
    assert [next(g) for _ in range(4)] == [0.1, 0.2, 0.4, 0.8]


def test_deep_merge_dicts_recursive_and_pure():
    a = {"x": {"y": 1, "z": 2}, "k": 1}
    b = {"x": {"z": 3, "w": 4}, "m": 5}
    out = deep_merge_dicts(a, b)
    assert out == {"x": {"y": 1, "z": 3, "w": 4}, "k": 1, "m": 5}
    assert a == {"x": {"y": 1, "z": 2}, "k": 1}  # input untouched


def test_deep_merge_smashes_non_dicts():
    assert deep_merge_dicts({"x": {"a": 1}}, {"x": 7}) == {"x": 7}


def test_merge_dicts_latest_wins():
    assert merge_dicts({"a": 1}, {"a": 2, "b": 3}) == {"a": 2, "b": 3}
    with pytest.raises(ValueError):
        merge_dicts({"a": 1})
