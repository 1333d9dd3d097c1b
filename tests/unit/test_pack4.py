"""4-bit upload packing (native/pack/pack4.cpp + device unpack parity)."""

import numpy as np

import jax

from marie_tpu.ocr.fused import _unpack4
from marie_tpu.utils.pack4 import pack4, unpack4_host


def test_roundtrip_error_bound():
    v = np.arange(256, dtype=np.uint8).reshape(2, 128)
    u = unpack4_host(pack4(v))
    assert np.abs(u.astype(np.int16) - v.astype(np.int16)).max() <= 8


def test_device_unpack_matches_host():
    rng = np.random.default_rng(3)
    pages = rng.integers(0, 256, (2, 16, 32), dtype=np.uint8)
    packed = pack4(pages)
    dev = np.asarray(jax.device_get(_unpack4(packed)))
    host = unpack4_host(packed)
    assert np.array_equal(dev, host)
    assert dev.shape == pages.shape


def test_odd_width_rejected():
    import pytest

    with pytest.raises(ValueError):
        pack4(np.zeros((2, 3), np.uint8))


def test_u2_roundtrip_error_bound():
    from marie_tpu.utils.pack4 import pack2, unpack2_host

    v = np.arange(256, dtype=np.uint8).reshape(2, 128)
    u = unpack2_host(pack2(v))
    assert np.abs(u.astype(np.int16) - v.astype(np.int16)).max() <= 42


def test_u2_device_unpack_matches_host():
    from marie_tpu.ocr.fused import _unpack2
    from marie_tpu.utils.pack4 import pack2, unpack2_host

    rng = np.random.default_rng(5)
    pages = rng.integers(0, 256, (2, 16, 32), dtype=np.uint8)
    packed = pack2(pages)
    dev = np.asarray(jax.device_get(_unpack2(packed)))
    host = unpack2_host(packed)
    assert np.array_equal(dev, host)
    assert dev.shape == pages.shape


def test_u2_bad_width_rejected():
    import pytest
    from marie_tpu.utils.pack4 import pack2

    with pytest.raises(ValueError):
        pack2(np.zeros((2, 6), np.uint8))


def test_norm_pack_bits():
    import pytest
    from marie_tpu.ocr.fused import _norm_pack_bits

    assert _norm_pack_bits(False) == 0
    assert _norm_pack_bits(None) == 0
    assert _norm_pack_bits(0) == 0
    assert _norm_pack_bits(True) == 4
    assert _norm_pack_bits(4) == 4
    assert _norm_pack_bits(2) == 2
    with pytest.raises(ValueError):
        _norm_pack_bits(3)
