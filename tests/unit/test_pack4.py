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


def test_u1_roundtrip_error_bound():
    from marie_tpu.utils.pack4 import pack1, unpack1_host

    v = np.arange(256, dtype=np.uint8).reshape(2, 128)
    u = unpack1_host(pack1(v))
    # binarization at 128: values land on 0 or 255, error < 128
    assert np.abs(u.astype(np.int16) - v.astype(np.int16)).max() <= 127
    assert set(np.unique(u)) <= {0, 255}


def test_u1_device_unpack_matches_host():
    from marie_tpu.ocr.fused import _unpack1
    from marie_tpu.utils.pack4 import pack1, unpack1_host

    rng = np.random.default_rng(7)
    pages = rng.integers(0, 256, (2, 16, 32), dtype=np.uint8)
    packed = pack1(pages)
    dev = np.asarray(jax.device_get(_unpack1(packed)))
    host = unpack1_host(packed)
    assert np.array_equal(dev, host)
    assert dev.shape == pages.shape


def test_u1_numpy_fallback_matches_native():
    # call the ctypes path DIRECTLY (not via pack1, whose fallback IS
    # the numpy expression below — that comparison would be tautological
    # on hosts where the native build fails)
    import ctypes

    import pytest

    from marie_tpu.utils import pack4 as mod

    try:
        lib = mod._load()
    except Exception as ex:  # noqa: BLE001
        pytest.skip(f"native pack lib unavailable: {ex}")
    rng = np.random.default_rng(11)
    pages = np.ascontiguousarray(
        rng.integers(0, 256, (3, 8, 64), dtype=np.uint8)
    )
    native = np.empty(pages.shape[:-1] + (pages.shape[-1] // 8,), np.uint8)
    lib.pack1(
        pages.ctypes.data_as(ctypes.c_void_p),
        native.ctypes.data_as(ctypes.c_void_p),
        native.size,
    )
    bits = (pages >= 128).astype(np.uint8)
    fallback = np.packbits(
        bits.reshape(bits.shape[:-1] + (-1, 8)), axis=-1, bitorder="big"
    ).reshape(native.shape)
    assert np.array_equal(native, fallback)


def test_u1d_dither_preserves_mean_gray():
    from marie_tpu.utils.pack4 import pack1d, unpack1_host

    # a flat mid-gray page: hard-threshold u1 collapses it to all-white;
    # ordered dither must keep the reconstructed MEAN near the input
    for gray, tol in ((64, 6), (128, 6), (192, 6)):
        pages = np.full((1, 32, 64), gray, np.uint8)
        u = unpack1_host(pack1d(pages))
        assert set(np.unique(u)) <= {0, 255}
        mean = float(u.mean())
        assert abs(mean - gray) <= tol * 4, (gray, mean)


def test_u1d_numpy_fallback_matches_native():
    import ctypes

    import pytest

    from marie_tpu.utils import pack4 as mod

    try:
        lib = mod._load()
    except Exception as ex:  # noqa: BLE001
        pytest.skip(f"native pack lib unavailable: {ex}")
    rng = np.random.default_rng(13)
    pages = np.ascontiguousarray(
        rng.integers(0, 256, (3, 16, 64), dtype=np.uint8)
    )
    h, w = pages.shape[-2:]
    native = np.empty(pages.shape[:-1] + (w // 8,), np.uint8)
    lib.pack1d(
        pages.ctypes.data_as(ctypes.c_void_p),
        native.ctypes.data_as(ctypes.c_void_p),
        pages.size // (h * w),
        h,
        w,
    )
    thresh = np.tile(mod._BAYER8_T, ((h + 7) // 8, (w + 7) // 8))[:h, :w]
    bits = (pages > thresh).astype(np.uint8)
    fallback = np.packbits(
        bits.reshape(bits.shape[:-1] + (-1, 8)), axis=-1, bitorder="big"
    ).reshape(native.shape)
    assert np.array_equal(native, fallback)


def test_u1_bad_width_rejected():
    import pytest
    from marie_tpu.utils.pack4 import pack1

    with pytest.raises(ValueError):
        pack1(np.zeros((2, 12), np.uint8))


def test_norm_pack_bits():
    import pytest
    from marie_tpu.ocr.fused import _norm_pack_bits

    assert _norm_pack_bits(False) == 0
    assert _norm_pack_bits(None) == 0
    assert _norm_pack_bits(0) == 0
    assert _norm_pack_bits(True) == 4
    assert _norm_pack_bits(4) == 4
    assert _norm_pack_bits(2) == 2
    assert _norm_pack_bits(1) == 1
    with pytest.raises(ValueError):
        _norm_pack_bits(3)
