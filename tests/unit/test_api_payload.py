"""Job payload extraction (reference marie/api/__init__.py:56-260)."""

import base64
import io
import os

import numpy as np
import pytest
from PIL import Image

from marie_tpu.api.payload import (
    base64_to_bytes,
    extract_payload,
    parse_payload_to_frames,
    sniff_file_type,
    store_temp_file,
    value_from_payload_or_args,
)


def _png_bytes(w=40, h=30, color=(255, 0, 0)):
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def _tiff_bytes(pages=2):
    buf = io.BytesIO()
    imgs = [Image.new("RGB", (40, 30), (i * 40, 0, 0)) for i in range(pages)]
    imgs[0].save(buf, format="TIFF", save_all=True, append_images=imgs[1:])
    return buf.getvalue()


def test_sniff_file_type():
    assert sniff_file_type(_png_bytes()) == "png"
    assert sniff_file_type(_tiff_bytes()) == "tiff"
    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="JPEG")
    assert sniff_file_type(buf.getvalue()) == "jpeg"
    assert sniff_file_type(b"not an image") is None


def test_base64_tolerates_data_uri_and_whitespace():
    raw = base64.b64encode(b"hello").decode()
    assert base64_to_bytes(raw) == b"hello"
    assert base64_to_bytes(f"data:image/png;base64,{raw}") == b"hello"
    assert base64_to_bytes(raw[:4] + "\n" + raw[4:]) == b"hello"


def test_extract_payload_data_key():
    data = base64.b64encode(_png_bytes()).decode()
    tmp, checksum, ftype = extract_payload({"data": data}, "q1")
    assert ftype == "png" and os.path.exists(tmp)
    assert len(checksum) == 64
    # same payload -> same digest-named file (dedupe)
    tmp2, checksum2, _ = extract_payload({"srcData": data}, "q1")
    assert (tmp, checksum) == (tmp2, checksum2)


def test_extract_payload_tiff_keeps_pages():
    data = base64.b64encode(_tiff_bytes(pages=3)).decode()
    frames, checksum, ftype = parse_payload_to_frames({"data": data}, "q2")
    assert ftype == "tiff"
    assert len(frames) == 3  # raw storage kept every page
    assert isinstance(frames[0], np.ndarray)


def test_extract_payload_src_file(tmp_path, monkeypatch):
    monkeypatch.setenv("MARIE_SHARE_DIR", str(tmp_path))
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "doc.png").write_bytes(_png_bytes())
    tmp, _, ftype = extract_payload({"srcFile": "sub/doc.png"}, "q3")
    assert ftype == "png"
    # traversal out of the share dir is rejected
    with pytest.raises(ValueError, match="escapes"):
        extract_payload({"srcFile": "../../etc/passwd"}, "q3")
    with pytest.raises(FileNotFoundError):
        extract_payload({"srcFile": "missing.png"}, "q3")


def test_extract_payload_uri(tmp_path):
    p = tmp_path / "remote.png"
    p.write_bytes(_png_bytes())
    tmp, _, ftype = extract_payload({"uri": str(p)}, "q4")
    assert ftype == "png"
    with pytest.raises(FileNotFoundError):
        extract_payload({"srcUrl": str(tmp_path / "nope.png")}, "q4")


def test_extract_payload_errors():
    with pytest.raises(ValueError, match="datasource"):
        extract_payload({"something": 1}, "q")
    bad = base64.b64encode(b"plain text").decode()
    with pytest.raises(ValueError, match="unsupported file type"):
        extract_payload({"data": bad}, "q")


def test_value_from_payload_or_args():
    payload = {"a": 1, "args": {"b": 2}}
    assert value_from_payload_or_args(payload, "a") == 1
    assert value_from_payload_or_args(payload, "b") == 2
    assert value_from_payload_or_args(payload, "c", default=3) == 3


def test_store_temp_file_raw_vs_normalized(tmp_path):
    png = _png_bytes()
    path_raw, d1 = store_temp_file(png, "qq", "png", store_raw=True)
    assert open(path_raw, "rb").read() == png
    path_norm, d2 = store_temp_file(png + b"", "qq2", "png", store_raw=False)
    assert os.path.exists(path_norm)
    assert d1 == d2  # digest is over the input bytes either way
