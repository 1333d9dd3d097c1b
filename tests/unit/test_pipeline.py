import os

import numpy as np
import pytest

from marie_tpu.components.base import PageInput
from marie_tpu.components.document_classifier import LayoutDocumentClassifier
from marie_tpu.components.document_indexer import LayoutDocumentIndexer
from marie_tpu.components.document_splitter import LayoutDocumentSplitter
from marie_tpu.models.configs import LayoutLMConfig
from marie_tpu.ocr.mock_ocr_engine import MockOcrEngine
from marie_tpu.pipe import ClassificationPipeline, ExtractPipeline


@pytest.fixture(scope="module")
def tiny_classifier():
    return LayoutDocumentClassifier(
        labels=("invoice", "receipt", "letter"),
        config=LayoutLMConfig.tiny(num_labels=3),
    )


@pytest.fixture(scope="module")
def tiny_indexer():
    return LayoutDocumentIndexer(
        labels=("O", "B-KEY", "I-KEY"),
        config=LayoutLMConfig.tiny(num_labels=3),
        window=16,
        stride=8,
    )


def _pages(n=2):
    return [
        PageInput(
            words=["alpha", "beta", "gamma"],
            boxes=[[10, 10, 40, 12], [60, 10, 40, 12], [10, 40, 40, 12]],
            page_size=(400, 300),
        )
        for _ in range(n)
    ]


def test_classifier_output_schema(tiny_classifier):
    out = tiny_classifier.predict(_pages(2))
    assert len(out) == 2
    for o in out:
        assert o["label"] in ("invoice", "receipt", "letter")
        assert 0 <= o["score"] <= 1
        assert abs(sum(o["scores"].values()) - 1.0) < 1e-4


def test_classifier_deterministic(tiny_classifier):
    a = tiny_classifier.predict(_pages(1))
    b = tiny_classifier.predict(_pages(1))
    assert a[0]["label"] == b[0]["label"]
    assert a[0]["score"] == pytest.approx(b[0]["score"], abs=1e-6)


def test_indexer_long_page_windows(tiny_indexer):
    # 40 words > window 16 -> sliding windows engage
    words = [f"w{i}" for i in range(40)]
    boxes = [[(i % 8) * 40, (i // 8) * 20, 35, 14] for i in range(40)]
    page = PageInput(words, boxes, page_size=(400, 300))
    out = tiny_indexer.index([page])
    assert len(out) == 1
    for ent in out[0]["entities"]:
        assert ent["label"] == "KEY"
        s, e = ent["word_span"]
        assert ent["text"] == " ".join(words[s:e])


def test_splitter_groups_documents():
    split = [
        {"label": "boundary", "score": 0.9, "is_boundary": True},
        {"label": "continuation", "score": 0.8, "is_boundary": False},
        {"label": "boundary", "score": 0.7, "is_boundary": True},
    ]
    docs = LayoutDocumentSplitter.to_documents(split)
    assert docs == [[0, 1], [2]]


def test_extract_pipeline_end_to_end(tmp_path, tiny_classifier, tiny_indexer):
    pipe = ExtractPipeline(
        ocr_engine=MockOcrEngine(),
        classifiers=[tiny_classifier],
        indexers=[tiny_indexer],
        work_dir=str(tmp_path),
        renderers=("text", "pdf", "blobs", "adlib"),
    )
    frames = [np.full((300, 400, 3), 255, np.uint8) for _ in range(2)]
    meta = pipe.execute("doc-1", "invoice", frames, job_id="job-9")
    assert meta["ref_id"] == "doc-1"
    assert meta["pages"] == 2
    assert len(meta["ocr"]) == 2
    assert len(meta["page_classifier"]) == 2
    assert len(meta["page_indexer"]) == 2
    paths = meta["assets"]
    names = {os.path.basename(p) for p in paths}
    assert "results.txt" in names
    assert "results.pdf" in names
    assert "1.BLOBS.XML" in names
    assert "summary.xml" in names


def test_extract_pipeline_feature_flags(tmp_path):
    pipe = ExtractPipeline(
        ocr_engine=MockOcrEngine(), work_dir=str(tmp_path), renderers=("text",)
    )
    frames = [np.full((200, 200, 3), 255, np.uint8)]
    meta = pipe.execute(
        "doc", "t", frames,
        runtime_conf={"page_classifier": {"enabled": False}},
    )
    assert "page_classifier" not in meta


def test_extract_pipeline_regions(tmp_path):
    pipe = ExtractPipeline(ocr_engine=MockOcrEngine(), work_dir=str(tmp_path))
    frames = [np.full((200, 200, 3), 255, np.uint8)]
    meta = pipe.execute(
        "doc", "t", frames,
        regions=[{"id": "r1", "pageIndex": 0, "x": 0, "y": 0, "w": 50, "h": 50}],
    )
    assert meta["regions"][0]["id"] == "r1"


def test_classification_pipeline(tiny_classifier, tmp_path):
    splitter = LayoutDocumentSplitter(config=LayoutLMConfig.tiny(num_labels=2))
    pipe = ClassificationPipeline(
        ocr_engine=MockOcrEngine(),
        classifiers=[tiny_classifier],
        splitter=splitter,
        work_dir=str(tmp_path),
    )
    frames = [np.full((300, 400, 3), 255, np.uint8) for _ in range(3)]
    meta = pipe.execute("d", "t", frames)
    assert len(meta["page_classifier"]) == 3
    assert len(meta["splitter"]) == 3
    assert meta["splitter"][0]["is_boundary"] is True
    assert sum(len(d) for d in meta["documents"]) == 3
