"""4-bit page packing for upload-bandwidth-limited device links.

Host side packs two 4-bit pixels per byte (native loop,
``native/pack/pack4.cpp`` — numpy's uint8 ufuncs are ~100x slower than
memcpy on single-core hosts); the device unpacks with ``nibble * 17``
inside the fused OCR program (:mod:`marie_tpu.ocr.fused`).  Grayscale
document pages quantized to 16 levels lose at most 8/255 per pixel —
the detection/recognition quality deltas are pinned by the bench's CER
and recall columns (run with ``upload_format='u4'`` vs ``'u8'``).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native", "pack",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libmarie_pack.so")

_lib = None
_lib_lock = threading.Lock()


def _load():
    global _lib
    with _lib_lock:
        if _lib is None:
            if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(os.path.join(_NATIVE_DIR, "pack4.cpp"))
                > os.path.getmtime(_SO_PATH)
            ):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO_PATH)
            for fn in (lib.pack4, lib.unpack4, lib.pack2, lib.unpack2,
                       lib.pack1, lib.unpack1):
                fn.restype = None
                fn.argtypes = [
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t
                ]
            lib.pack1d.restype = None
            lib.pack1d.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_size_t, ctypes.c_size_t,
            ]
            _lib = lib
    return _lib


def pack4(pages: np.ndarray) -> np.ndarray:
    """[..., W] uint8 (W even) -> [..., W//2] packed nibbles (rounded)."""
    pages = np.ascontiguousarray(pages, dtype=np.uint8)
    if pages.shape[-1] % 2:
        raise ValueError(f"last dim must be even, got {pages.shape}")
    out = np.empty(pages.shape[:-1] + (pages.shape[-1] // 2,), np.uint8)
    try:
        _load().pack4(
            pages.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            out.size,
        )
    except (OSError, subprocess.CalledProcessError):
        # numpy fallback (slow on single-core hosts, but correct):
        # nibble = round(v/17), the inverse of the device's nibble*17
        q = ((pages.astype(np.uint16) + 8) // 17).astype(np.uint8)
        out = (q[..., 0::2] << 4) | q[..., 1::2]
    return out


def unpack4_host(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse (parity tests): [..., W//2] -> [..., W] uint8."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), np.uint8)
    try:
        _load().unpack4(
            packed.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            packed.size,
        )
    except (OSError, subprocess.CalledProcessError):
        hi = ((packed >> 4) * np.uint8(17))
        lo = ((packed & 0xF) * np.uint8(17))
        out = np.stack([hi, lo], axis=-1).reshape(out.shape)
    return out


def pack2(pages: np.ndarray) -> np.ndarray:
    """[..., W] uint8 (W % 4 == 0) -> [..., W//4] 2-bit packed (rounded).

    Four gray levels (0, 85, 170, 255): a QUARTER of the link bytes.
    Lossier than :func:`pack4` — the bench's CER/recall columns gate it
    per stack (``upload_format='u2'``)."""
    pages = np.ascontiguousarray(pages, dtype=np.uint8)
    if pages.shape[-1] % 4:
        raise ValueError(f"last dim must be divisible by 4, got {pages.shape}")
    out = np.empty(pages.shape[:-1] + (pages.shape[-1] // 4,), np.uint8)
    try:
        _load().pack2(
            pages.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            out.size,
        )
    except (OSError, subprocess.CalledProcessError):
        q = ((pages.astype(np.uint16) + 42) // 85).astype(np.uint8)
        out = (
            (q[..., 0::4] << 6) | (q[..., 1::4] << 4)
            | (q[..., 2::4] << 2) | q[..., 3::4]
        )
    return out


def pack1(pages: np.ndarray) -> np.ndarray:
    """[..., W] uint8 (W % 8 == 0) -> [..., W//8] 1-bit packed.

    Binarized at 128 (levels 0, 255): an EIGHTH of the link bytes —
    the relay-robustness floor for clean black-on-white documents.
    Lossiest format; anti-aliased glyph edges go hard, so the oracle's
    CER/recall columns must gate it per stack (``upload_format='u1'``)."""
    pages = np.ascontiguousarray(pages, dtype=np.uint8)
    if pages.shape[-1] % 8:
        raise ValueError(f"last dim must be divisible by 8, got {pages.shape}")
    out = np.empty(pages.shape[:-1] + (pages.shape[-1] // 8,), np.uint8)
    try:
        _load().pack1(
            pages.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            out.size,
        )
    except (OSError, subprocess.CalledProcessError):
        bits = (pages >= 128).astype(np.uint8)
        out = np.packbits(bits.reshape(bits.shape[:-1] + (-1, 8)),
                          axis=-1, bitorder="big").reshape(out.shape)
    return out


# 8x8 Bayer matrix (standard ordered-dither index pattern)
_BAYER8 = np.array(
    [
        [0, 32, 8, 40, 2, 34, 10, 42],
        [48, 16, 56, 24, 50, 18, 58, 26],
        [12, 44, 4, 36, 14, 46, 6, 38],
        [60, 28, 52, 20, 62, 30, 54, 22],
        [3, 35, 11, 43, 1, 33, 9, 41],
        [51, 19, 59, 27, 49, 17, 57, 25],
        [15, 47, 7, 39, 13, 45, 5, 37],
        [63, 31, 55, 23, 61, 29, 53, 21],
    ],
    np.uint8,
)
#: per-position thresholds in 0..255 ((b + 0.5) * 4 - 0.5 rounded)
_BAYER8_T = (_BAYER8.astype(np.uint16) * 4 + 1).astype(np.uint8)


def pack1d(pages: np.ndarray) -> np.ndarray:
    """[..., H, W] uint8 (W % 8 == 0) -> [..., H, W//8] 1-bit packed with
    ORDERED (8x8 Bayer) dithering.

    Same eighth-of-the-bytes wire format as :func:`pack1`, but gray
    levels survive as spatial bit density instead of dying at a hard
    128 threshold: the recognizer's bilinear crop resampling and the
    detector's stride-2 stem average the dither back into approximate
    grayscale.  The hard-threshold ``u1`` measured CER +0.064 on the
    anti-aliased serif-bold oracle row; this variant exists to win that
    back while keeping the 1-bit upload floor."""
    pages = np.ascontiguousarray(pages, dtype=np.uint8)
    if pages.shape[-1] % 8:
        raise ValueError(f"last dim must be divisible by 8, got {pages.shape}")
    h, w = pages.shape[-2], pages.shape[-1]
    try:
        out = np.empty(pages.shape[:-1] + (w // 8,), np.uint8)
        _load().pack1d(
            pages.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            pages.size // (h * w),
            h,
            w,
        )
        return out
    except (OSError, subprocess.CalledProcessError, AttributeError):
        thresh = np.tile(
            _BAYER8_T, ((h + 7) // 8, (w + 7) // 8)
        )[:h, :w]
        bits = (pages > thresh).astype(np.uint8)
        return np.packbits(
            bits.reshape(bits.shape[:-1] + (-1, 8)), axis=-1, bitorder="big"
        ).reshape(pages.shape[:-1] + (w // 8,))


def unpack1_host(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse (parity tests): [..., W//8] -> [..., W] uint8."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 8,), np.uint8)
    try:
        _load().unpack1(
            packed.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            packed.size,
        )
    except (OSError, subprocess.CalledProcessError):
        bits = np.unpackbits(packed[..., None], axis=-1, bitorder="big")
        out = (bits.reshape(out.shape) * np.uint8(255))
    return out


def unpack2_host(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse (parity tests): [..., W//4] -> [..., W] uint8."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 4,), np.uint8)
    try:
        _load().unpack2(
            packed.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            packed.size,
        )
    except (OSError, subprocess.CalledProcessError):
        parts = [((packed >> s) & 3) * np.uint8(85) for s in (6, 4, 2, 0)]
        out = np.stack(parts, axis=-1).reshape(out.shape)
    return out
