"""Job-message payload extraction (reference ``marie/api/__init__.py:23-260``).

Job payloads reference their document in one of several historical key
shapes — ``data``/``srcData`` (base64), ``srcBase64`` (base64, stored
raw), ``srcFile`` (path under the shared directory), ``uri``/``srcUrl``
(any StorageManager-routable location).  ``extract_payload`` normalizes
all of them to a checksummed temp file; ``parse_payload_to_docs`` goes
all the way to page frames.
"""

import base64
import hashlib
import os
import tempfile
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from marie_tpu.helper import ensure_exists
from marie_tpu.logging_core import MarieLogger
from marie_tpu.storage.manager import StorageManager

logger = MarieLogger("api.payload")

ALLOWED_TYPES = ("png", "jpeg", "tiff", "bmp", "gif", "webp")

_MAGIC = (
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"BM", "bmp"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
)


def sniff_file_type(data: bytes) -> Optional[str]:
    """Magic-byte image sniffing (replaces the stdlib ``imghdr`` the
    reference uses — removed in Python 3.13)."""
    for magic, kind in _MAGIC:
        if data[: len(magic)] == magic:
            return kind
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "webp"
    return None


def base64_to_bytes(raw: str) -> bytes:
    """Tolerant base64 decode (data-URI prefixes and whitespace ok)."""
    if "," in raw[:64] and raw.lstrip().startswith("data:"):
        raw = raw.split(",", 1)[1]
    return base64.b64decode("".join(raw.split()))


def get_share_directory() -> str:
    return os.environ.get("MARIE_SHARE_DIR", "/tmp/marie-share")


def store_temp_file(
    message_bytes: bytes, queue_id: str, file_type: str, store_raw: bool
) -> Tuple[str, str]:
    """Persist payload bytes to a digest-named temp file; returns
    ``(path, sha256-checksum)`` (reference ``store_temp_file``).  With
    ``store_raw`` the bytes land verbatim; otherwise they are re-encoded
    through PIL to normalize the container."""
    digest = hashlib.sha256(message_bytes).hexdigest()
    out_dir = ensure_exists(
        os.path.join(tempfile.gettempdir(), "marie", queue_id or "default")
    )
    path = os.path.join(out_dir, f"{digest}.{file_type}")
    if os.path.exists(path):
        return path, digest
    if store_raw:
        with open(path, "wb") as fp:
            fp.write(message_bytes)
        return path, digest
    import io

    from PIL import Image

    Image.open(io.BytesIO(message_bytes)).save(path)
    return path, digest


def extract_payload(payload: Dict[str, Any], queue_id: str) -> Tuple[str, str, str]:
    """Resolve a job payload's document to a temp file.

    Returns ``(tmp_file, checksum, file_type)``.  Key precedence matches
    the reference (``marie/api/__init__.py:56``): ``data``/``srcData`` →
    ``srcBase64`` → ``srcFile`` (shared dir) → ``uri``/``srcUrl``
    (StorageManager).
    """
    store_raw = False
    if "data" in payload or "srcData" in payload:
        data = base64_to_bytes(payload.get("data") or payload["srcData"])
    elif "srcBase64" in payload:
        data = base64_to_bytes(payload["srcBase64"])
        store_raw = True
    elif "srcFile" in payload:
        base_dir = get_share_directory()
        path = os.path.abspath(os.path.join(base_dir, payload["srcFile"]))
        # confine to the share dir (the reference notes this resolution
        # as a fixme; the confinement closes the traversal hole)
        if not path.startswith(os.path.abspath(base_dir) + os.sep):
            raise ValueError(f"srcFile escapes the share directory: {path}")
        if not os.path.exists(path):
            raise FileNotFoundError(f"File not found: {payload['srcFile']}")
        with open(path, "rb") as fp:
            data = fp.read()
        store_raw = True
    elif "uri" in payload or "srcUrl" in payload:
        uri = payload.get("uri") or payload["srcUrl"]
        if not StorageManager.can_handle(uri):
            raise ValueError(f"no storage handler for {uri!r}")
        if not StorageManager.exists(uri):
            raise FileNotFoundError(f"remote file does not exist: {uri}")
        data = StorageManager.read(uri)
        store_raw = True
    else:
        raise ValueError("unable to determine datasource in payload")

    if not data:
        raise ValueError("no data read from payload")
    file_type = sniff_file_type(data)
    if file_type not in ALLOWED_TYPES:
        raise ValueError(
            f"unsupported file type {file_type!r}, expected one of {ALLOWED_TYPES}"
        )
    if file_type == "tiff":
        store_raw = True  # keep every page — re-encode drops all but one
    tmp_file, digest = store_temp_file(data, queue_id, file_type, store_raw)
    logger.info(f"File info: {digest} {file_type}, {tmp_file}")
    return tmp_file, digest, file_type


def value_from_payload_or_args(
    payload: Dict[str, Any], key: str, default: Any = None
) -> Any:
    """Look up ``key`` in the payload, falling back to payload['args']
    (reference ``value_from_payload_or_args``)."""
    if key in payload:
        return payload[key]
    args = payload.get("args") or {}
    return args.get(key, default)


def parse_payload_to_frames(
    payload: Dict[str, Any], queue_id: str = ""
) -> Tuple[List[np.ndarray], str, str]:
    """Payload → page frames (reference ``parse_payload_to_docs``).
    Returns ``(frames, checksum, file_type)``."""
    from marie_tpu.utils.docs import frames_from_file

    tmp_file, checksum, file_type = extract_payload(payload, queue_id)
    return frames_from_file(tmp_file), checksum, file_type
