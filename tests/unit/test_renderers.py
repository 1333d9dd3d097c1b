import os
import xml.etree.ElementTree as ET

import numpy as np

from marie_tpu.renderer import AdlibRenderer, BlobRenderer, PdfRenderer, TextRenderer


def _fake_result(w=300, h=200):
    return {
        "meta": {
            "imageSize": {"width": w, "height": h},
            "page": 0,
            "lang": "en",
            "format": "xywh",
        },
        "words": [
            {"id": 0, "text": "Hello", "confidence": 0.9, "box": [10, 20, 60, 16], "line": 1, "word_index": 0},
            {"id": 1, "text": "World", "confidence": 0.8, "box": [90, 20, 60, 16], "line": 1, "word_index": 1},
            {"id": 2, "text": "Again", "confidence": 0.8, "box": [10, 60, 60, 16], "line": 2, "word_index": 2},
        ],
        "lines": [
            {"line": 1, "wordids": [0, 1], "text": "Hello World", "bbox": [10, 20, 140, 16], "confidence": 0.85},
            {"line": 2, "wordids": [2], "text": "Again", "bbox": [10, 60, 60, 16], "confidence": 0.8},
        ],
    }


def _frame(w=300, h=200):
    return np.full((h, w, 3), 255, np.uint8)


def test_text_renderer_plain(tmp_path):
    out = tmp_path / "out.txt"
    TextRenderer().render([_frame()], [_fake_result()], str(out))
    content = out.read_text()
    assert "Hello World" in content
    assert "Again" in content


def test_text_renderer_spatial(tmp_path):
    r = TextRenderer({"preserve_interword_spaces": True})
    page = r.render_page(_frame(), _fake_result(), 0)
    lines = page.split("\n")
    assert lines[0].lstrip().startswith("Hello")
    # second word starts at column ~ 90/8.44 ≈ 10
    assert lines[0].index("World") > lines[0].index("Hello") + 5


def test_pdf_renderer_produces_valid_searchable_pdf(tmp_path):
    out = tmp_path / "out.pdf"
    PdfRenderer().render([_frame(), _frame()], [_fake_result(), _fake_result()], str(out))
    data = out.read_bytes()
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert b"/Count 2" in data
    assert b"DCTDecode" in data
    # text is flate-compressed; decompress streams and look for our words
    import re
    import zlib

    found = False
    for m in re.finditer(rb"stream\n(.*?)\nendstream", data, re.S):
        try:
            txt = zlib.decompress(m.group(1))
            if b"Hello" in txt and b"3 Tr" in txt:
                found = True
        except zlib.error:
            pass
    assert found


def test_adlib_renderer(tmp_path):
    out_dir = tmp_path / "adlib"
    AdlibRenderer().render([_frame()], [_fake_result()], str(out_dir))
    page = ET.parse(out_dir / "1.tif.xml").getroot()
    assert page.tag == "PAGE"
    strings = page.findall("TEXTSTRING")
    assert len(strings) == 3
    assert strings[0].get("WORD") == "Hello"
    assert abs(float(strings[0].get("LEFT")) - 10 / 300.0) < 1e-4
    summary = ET.parse(out_dir / "summary.xml").getroot()
    assert summary.tag == "OCR"
    assert len(summary.find("PAGES").findall("PAGE")) == 1


def test_blob_renderer(tmp_path):
    out_dir = tmp_path / "blobs"
    BlobRenderer().render([_frame()], [_fake_result()], str(out_dir))
    root = ET.parse(out_dir / "1.BLOBS.XML").getroot()
    assert root.tag == "blobs"
    blobs = root.findall("blob")
    assert len(blobs) == 3
    assert blobs[0].get("text") == "Hello"
    assert blobs[0].find("page").text == "1"


def test_xyxy_converted(tmp_path):
    res = _fake_result()
    res["meta"]["format"] = "xyxy"
    res["words"][0]["box"] = [10, 20, 70, 36]  # xyxy of the same box
    r = BlobRenderer()
    tree = r.render_page(_frame(), res, 0)
    blob = tree.getroot().findall("blob")[0]
    assert blob.get("w") == "60"
    assert res["meta"]["format"] == "xywh"


def test_meta_to_text_from_json(tmp_path):
    """meta_to_text renders saved result JSON without frames (reference
    marie/ocr/util.py:44 — frames synthesised from meta.imageSize)."""
    import json

    from marie_tpu.ocr.util import meta_to_text

    res = [
        {
            "meta": {"imageSize": {"width": 300, "height": 80}},
            "words": [
                {"id": 0, "text": "net", "confidence": 0.9,
                 "box": [5, 5, 40, 14], "line": 1, "word_index": 0},
                {"id": 1, "text": "30", "confidence": 0.9,
                 "box": [60, 5, 30, 14], "line": 1, "word_index": 1},
            ],
            "lines": [
                {"line": 1, "wordids": [0, 1], "text": "net 30",
                 "bbox": [5, 5, 85, 14], "confidence": 0.9}
            ],
        }
    ]
    # dict form
    txt = meta_to_text(res)
    assert "net" in txt and "30" in txt
    # path form + explicit output file
    src = tmp_path / "r.json"
    src.write_text(json.dumps(res))
    out = tmp_path / "r.txt"
    txt2 = meta_to_text(str(src), text_output_path=str(out))
    assert out.read_text() == txt2 and "net" in txt2
