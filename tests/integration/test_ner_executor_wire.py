"""NerExtractionExecutor over the serving plane: client posts words+boxes
(the OCR-upstream contract) and receives aggregated entities — the
reference's ``/ner/extract`` surface
(``/root/reference/marie/executor/ner/ner_extraction_executor.py:48``)."""

from marie_tpu.clients import Client
from marie_tpu.executor import NerExtractionExecutor
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document


def test_ner_extract_over_grpc():
    flow = Flow().add(uses=NerExtractionExecutor, name="ner")
    with flow:
        client = Client(port=flow.port_gateway)
        words = ["Name:", "John", "Smith", "Amount:", "125.00"]
        boxes = [
            [20, 20, 60, 14], [90, 20, 50, 14], [150, 20, 55, 14],
            [20, 44, 75, 14], [105, 44, 60, 14],
        ]
        docs = client.post(
            "/ner/extract",
            [Document(tags={"words": words, "boxes": boxes})],
        )
        res = docs[0].tags.get("indexer")
        assert res is not None, "indexer result missing from doc tags"
        assert "entities" in res, res
        # label set comes from the trained zoo head (BIO over KEY/VALUE);
        # the executor must return one prediction span list, not crash
        assert isinstance(res["entities"], list)
