import numpy as np
import pytest

import jax.numpy as jnp


def test_batched_nms_classes_do_not_suppress():
    from marie_tpu.ops.nms import batched_nms

    boxes = jnp.array([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.array([0.9, 0.8])
    # same class -> second suppressed
    keep, _ = batched_nms(boxes, scores, jnp.array([0, 0]), iou_threshold=0.5)
    assert np.asarray(keep).tolist() == [True, False]
    # different classes -> both kept
    keep, _ = batched_nms(boxes, scores, jnp.array([0, 1]), iou_threshold=0.5)
    assert np.asarray(keep).tolist() == [True, True]


def test_voting_engine_skips_unavailable_processor():
    from marie_tpu.boxes.ink_box_processor import InkBoxProcessor
    from marie_tpu.document.ocr_processor import OcrProcessor
    from marie_tpu.document.tesseract_ocr_processor import TesseractOcrProcessor
    from marie_tpu.ocr.voting_ocr_engine import VotingOcrEngine
    from tests.helpers import synth_page

    class Fixed(OcrProcessor):
        def recognize_from_fragments(self, fragments):
            return [{"text": "ok", "confidence": 0.9} for _ in fragments]

    eng = VotingOcrEngine(
        InkBoxProcessor(),
        [Fixed(), TesseractOcrProcessor()],  # tesseract unavailable -> skipped
    )
    page, _ = synth_page([("hello", 50, 100)])
    r = eng.extract([page])[0]
    assert r["words"][0]["text"] == "ok"


def test_region_extraction_modes():
    from marie_tpu.boxes.ink_box_processor import InkBoxProcessor
    from marie_tpu.document.ocr_processor import OcrProcessor
    from marie_tpu.ocr.ocr_engine import PipelineOcrEngine
    from tests.helpers import synth_page

    class Echo(OcrProcessor):
        def recognize_from_fragments(self, fragments):
            return [
                {"text": f"f{i}", "confidence": 1.0}
                for i in range(len(fragments))
            ]

    eng = PipelineOcrEngine(InkBoxProcessor(), Echo())
    page, _ = synth_page([("one", 50, 100), ("two", 150, 100)], size=(300, 400))
    regions = [
        {"id": "raw", "pageIndex": 0, "x": 40, "y": 90, "w": 200, "h": 40,
         "mode": "raw_line"},
        {"id": "sparse", "pageIndex": 0, "x": 40, "y": 90, "w": 200, "h": 40,
         "mode": "sparse"},
    ]
    out = eng.extract([page], regions=regions)
    assert out[0]["id"] == "raw"
    assert out[0]["text"] == "f0"  # whole region as one fragment
    assert out[1]["id"] == "sparse"
    assert len(out[1]["words"]) == 2  # word detection inside the region


def test_executor_yaml_requests_remap(tmp_path):
    from marie_tpu.serve.executors import BaseExecutor
    from marie_tpu.serve.executors.decorators import requests

    class Remappable(BaseExecutor):
        @requests(on="/orig")
        def handler(self, docs, **kwargs):
            return docs

        def other(self, docs, **kwargs):
            for d in docs:
                d.text = "other"
            return docs

    ex = Remappable(requests={"/custom": "other"})
    assert "/orig" in ex.requests
    assert "/custom" in ex.requests
    import asyncio

    from marie_tpu.types.docs import Document, DocumentArray

    docs = asyncio.run(ex.__acall__("/custom", DocumentArray([Document()]), {}))
    assert docs[0].text == "other"


def test_jaml_save_config_roundtrip(tmp_path):
    from marie_tpu.jaml import JAML, JAMLCompatible

    class Cfg(JAMLCompatible):
        def __init__(self, dim: int = 3):
            self.dim = dim
            self._init_kwargs_ = {"dim": dim}

    obj = Cfg(dim=9)
    path = str(tmp_path / "cfg.yml")
    obj.save_config(path)
    loaded = Cfg.load_config(path)
    assert isinstance(loaded, Cfg)
    assert loaded.dim == 9


def test_worker_reduce_docs_dedup():
    from marie_tpu.serve.runtimes.worker.request_handling import (
        WorkerRequestHandler,
    )
    from marie_tpu.types.docs import Document, DocumentArray
    from marie_tpu.types.request import DataRequest

    d1, d2, d3 = Document(text="a"), Document(text="b"), Document(text="c")
    r1 = DataRequest.from_docs(DocumentArray([d1, d2]))
    r2 = DataRequest.from_docs(DocumentArray([d2, d3]))
    merged = WorkerRequestHandler.reduce_docs([r1, r2])
    assert len(merged) == 3
    assert sorted(merged.texts) == ["a", "b", "c"]
