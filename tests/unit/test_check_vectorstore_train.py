import numpy as np
import pytest


def _page(words):
    return {
        "meta": {"imageSize": {"width": 400, "height": 300}},
        "words": [
            {"id": i, "text": t, "box": b, "confidence": 0.9, "line": 1}
            for i, (t, b) in enumerate(words)
        ],
        "lines": [],
    }


def test_compare_results_identical():
    from marie_tpu.check import compare_results

    page = _page([("hello", [10, 10, 50, 14]), ("world", [80, 10, 50, 14])])
    report = compare_results([page], [page])
    assert report["detection"]["precision"] == 1.0
    assert report["detection"]["recall"] == 1.0
    assert report["recognition"]["cer"] == 0.0
    assert not report["drift_detected"]


def test_compare_results_detects_drift():
    from marie_tpu.check import compare_results

    golden = _page([("hello", [10, 10, 50, 14]), ("world", [80, 10, 50, 14])])
    cand = _page([("hallo", [11, 10, 50, 14])])  # one missing + text drift
    report = compare_results([golden], [cand])
    assert report["detection"]["missing"] == 1
    assert report["recognition"]["cer"] > 0
    assert report["drift_detected"]


def test_vector_store_search():
    from marie_tpu.vectorstores import InMemoryVectorStore

    store = InMemoryVectorStore()
    vecs = np.eye(4, dtype=np.float32)
    store.add(
        ["a", "b", "c", "d"],
        payloads=[{"text": t} for t in "abcd"],
        vectors=vecs,
    )
    hits = store.search(np.array([1.0, 0.1, 0, 0], np.float32), k=2)
    assert hits[0][1]["text"] == "a"
    assert hits[0][0] > hits[1][0]
    assert len(store) == 4


def test_vector_store_with_embeddings_model():
    from marie_tpu.embeddings import LayoutEmbeddingsModel
    from marie_tpu.models.configs import LayoutLMConfig
    from marie_tpu.vectorstores import InMemoryVectorStore

    model = LayoutEmbeddingsModel(config=LayoutLMConfig.tiny())
    store = InMemoryVectorStore(model)
    store.add(["invoice total due", "patient claim form", "shipping manifest"])
    hits = store.search("invoice total due", k=1)
    assert hits[0][1]["text"] == "invoice total due"
    assert hits[0][0] > 0.99  # same text -> same embedding


def test_dit_box_processor_runs():
    from marie_tpu.boxes.dit_box_processor import BoxProcessorUlimDit
    from marie_tpu.models.configs import ViTConfig
    from marie_tpu.preprocess import BucketSpec
    from tests.helpers import synth_page

    proc = BoxProcessorUlimDit(
        config=ViTConfig(
            image_size=(128, 128), patch_size=16, hidden_dim=32,
            num_layers=1, num_heads=2, mlp_dim=64, use_cls_token=False,
        ),
        bucket_spec=BucketSpec(shapes=((128, 128),)),
        text_threshold=0.0,
        low_text=0.45,
    )
    page, _ = synth_page([("word", 20, 40)], size=(100, 120))
    boxes, scores = proc.detect_words(page)
    assert boxes.shape[1] == 4  # runs end-to-end with random weights
