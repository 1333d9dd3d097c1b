"""Image helpers (host) — parity vocabulary with
``/root/reference/marie/utils/image_utils.py``."""

import hashlib
from typing import List, Sequence, Tuple

import numpy as np


def hash_frames_fast(frames: Sequence[np.ndarray]) -> str:
    """Stable checksum of a frame list (used as the pipeline asset key)."""
    h = hashlib.sha256()
    for f in frames:
        h.update(np.ascontiguousarray(f[:: max(f.shape[0] // 64, 1)]).tobytes())
        h.update(str(f.shape).encode())
    return h.hexdigest()[:32]


def crop_to_content(image: np.ndarray, content_aware: bool = True) -> np.ndarray:
    """Trim white margins (reference crop_to_content)."""
    gray = image.mean(axis=-1) if image.ndim == 3 else image
    ink = gray < 250
    rows = np.nonzero(ink.any(axis=1))[0]
    cols = np.nonzero(ink.any(axis=0))[0]
    if len(rows) == 0 or len(cols) == 0:
        return image
    return image[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def ensure_max_page_size(
    image: np.ndarray, max_h: int = 3000, max_w: int = 3000
) -> Tuple[np.ndarray, float]:
    """Downscale oversized pages; returns (image, scale_applied<=1)."""
    h, w = image.shape[:2]
    scale = min(max_h / h, max_w / w, 1.0)
    if scale >= 1.0:
        return image, 1.0
    import cv2

    resized = cv2.resize(
        image, (int(w * scale), int(h * scale)), interpolation=cv2.INTER_AREA
    )
    return resized, scale


def imwrite(path: str, image: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(image).save(path)
