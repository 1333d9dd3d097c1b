"""Image/bytes base64 codec (reference ``marie/utils/base64.py`` —
PNG-encoded image → base64 string and back; used by the job-payload
``srcBase64`` key and the HTTP clients)."""

import base64
import io
from typing import Optional

import numpy as np


def encode_to_base64(img: np.ndarray, format: str = "PNG") -> str:
    """Encode an image array as base64 text (PNG container by default)."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.asarray(img)).save(buf, format=format)
    return base64.b64encode(buf.getvalue()).decode()


def base64_to_bytes(data: Optional[str]) -> bytes:
    """Decode base64 text to raw bytes (None → b'')."""
    if data is None:
        return b""
    return base64.b64decode(data.encode("utf-8"))


def base64_to_image(data: str) -> np.ndarray:
    """Decode base64 text holding an encoded image to an array."""
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(base64_to_bytes(data))))


# reference-style aliases
encodeToBase64 = encode_to_base64
base64StringToBytes = base64_to_bytes
