import numpy as np
import pytest

from tests.helpers import synth_page


def test_ncc_template_matcher_finds_exact_template():
    from marie_tpu.components.template_matching import NCCTemplateMatcher

    page, boxes = synth_page(
        [("stamp", 100, 50), ("other", 300, 200)], size=(300, 400)
    )
    # add a distinctive pattern block
    rng = np.random.default_rng(0)
    patch = (rng.random((24, 40, 3)) * 255).astype(np.uint8)
    page[220:244, 60:100] = patch

    matcher = NCCTemplateMatcher()
    matcher.add_template("seal", patch)
    matches = matcher.match([page], score_threshold=0.9)
    assert len(matches) >= 1
    best = max(matches, key=lambda m: m.score)
    assert best.label == "seal"
    x, y, w, h = best.bbox
    assert abs(x - 60) <= 1 and abs(y - 220) <= 1
    assert best.score > 0.95


def test_ncc_matcher_no_false_positive_on_blank():
    from marie_tpu.components.template_matching import NCCTemplateMatcher

    page = np.full((200, 200, 3), 255, np.uint8)
    rng = np.random.default_rng(1)
    tpl = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    matcher = NCCTemplateMatcher()
    matcher.add_template("x", tpl)
    matches = matcher.match([page], score_threshold=0.8)
    assert matches == []


def test_composite_matcher_dedups():
    from marie_tpu.components.template_matching import (
        CompositeTemplateMatcher,
        NCCTemplateMatcher,
    )

    page = np.full((128, 128, 3), 255, np.uint8)
    rng = np.random.default_rng(2)
    patch = (rng.random((20, 20, 3)) * 255).astype(np.uint8)
    page[40:60, 40:60] = patch
    m = CompositeTemplateMatcher([NCCTemplateMatcher(), NCCTemplateMatcher()])
    m.add_template("p", patch)
    matches = m.match([page], score_threshold=0.9)
    assert len(matches) == 1  # duplicates across children removed


def test_boundary_registration_detects_skew():
    import cv2

    from marie_tpu.components.document_registration import (
        DocumentBoundaryRegistration,
    )

    page, _ = synth_page(
        [(f"w{i}{j}", 40 + j * 70, 40 + i * 30) for i in range(8) for j in range(6)],
        size=(320, 480),
    )
    angle_true = 3.0
    m = cv2.getRotationMatrix2D((240, 160), angle_true, 1.0)
    skewed = cv2.warpAffine(
        page, m, (480, 320), borderValue=(255, 255, 255)
    )
    # use_model=False: this test pins the weight-free angle-sweep path
    # (the trained corner-regressor path is covered in
    # tests/unit/test_trained_components.py)
    reg = DocumentBoundaryRegistration(
        max_skew_deg=6.0, num_angles=49, registration_method="none",
        use_model=False,
    )
    pred = reg.register(skewed)
    assert pred.detected
    # recovered angle close to the induced skew
    assert abs(pred.angle - angle_true) < 1.0
    assert pred.aligned.shape == skewed.shape


def test_boundary_fit_to_page_fills_frame():
    from marie_tpu.components.document_registration import (
        DocumentBoundaryRegistration,
    )

    page, _ = synth_page([("content", 200, 150)], size=(300, 400))
    reg = DocumentBoundaryRegistration(
        registration_method="fit_to_page", use_model=False
    )
    pred = reg.register(page)
    # after fit_to_page the content fills the frame -> ink near the borders
    g = pred.aligned.mean(axis=-1)
    assert (g < 200).any()
    assert pred.aligned.shape == page.shape


def test_layout_embeddings():
    from marie_tpu.embeddings import LayoutEmbeddingsModel
    from marie_tpu.models.configs import LayoutLMConfig

    model = LayoutEmbeddingsModel(config=LayoutLMConfig.tiny())
    embs = model.get_embeddings(["invoice total amount", "patient claim form"])
    assert embs.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(embs, axis=-1), 1.0, atol=1e-4)
    # deterministic + same text -> same embedding
    e2 = model.embed_query("invoice total amount")
    np.testing.assert_allclose(e2, embs[0], atol=1e-5)
    # different texts -> different embeddings
    assert np.abs(embs[0] - embs[1]).max() > 1e-3


def test_executors_mock_and_classify(tmp_path):
    import asyncio

    from marie_tpu.components.document_classifier import LayoutDocumentClassifier
    from marie_tpu.executor.classifier_executor import DocumentClassificationExecutor
    from marie_tpu.executor.text_extraction_executor import TextExtractionExecutorMock
    from marie_tpu.models.configs import LayoutLMConfig
    from marie_tpu.types.docs import Document, DocumentArray

    mock = TextExtractionExecutorMock()
    docs = DocumentArray(
        [Document(tensor=np.full((64, 64, 3), 255, np.uint8))]
    )
    out = asyncio.run(mock.__acall__("/document/extract", docs, {}))
    assert out["status"] == "succeeded"
    assert len(out["metadata"]["ocr"]) == 1

    clf_exec = DocumentClassificationExecutor(
        classifier=LayoutDocumentClassifier(
            labels=("a", "b"), config=LayoutLMConfig.tiny(num_labels=2)
        )
    )
    docs = DocumentArray([Document(tags={"words": ["x"], "boxes": [[0, 0, 5, 5]]})])
    out = asyncio.run(clf_exec.__acall__("/document/classify", docs, {}))
    assert out["status"] == "succeeded"
    assert out["classifications"][0]["label"] in ("a", "b")
