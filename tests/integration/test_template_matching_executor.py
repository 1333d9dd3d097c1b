"""TemplateMatchingExecutor over the serving plane (VERDICT r2 #10 —
reference: /root/reference/marie/executor/template_matching/
template_matching_executor.py:41 `/document/matcher`)."""

import numpy as np

from marie_tpu.clients import Client
from marie_tpu.executor import TemplateMatchingExecutor
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.types.docs import Document


def _page_with_stamp(h=224, w=288, x=96, y=64):
    """White page with a distinctive checkered stamp at (x, y)."""
    rng = np.random.default_rng(0)
    page = np.full((h, w), 255, np.uint8)
    stamp = (rng.integers(0, 2, (32, 48)) * 255).astype(np.uint8)
    stamp = np.kron(stamp, np.ones((1, 1), np.uint8))
    page[y : y + 32, x : x + 48] = stamp
    return page, stamp


def test_register_then_match_over_grpc():
    page, stamp = _page_with_stamp()
    flow = Flow().add(uses=TemplateMatchingExecutor, name="matcher",
                      uses_with={"matcher_name": "ncc"})
    with flow:
        client = Client(port=flow.port_gateway)
        reg = client.post(
            "/template_matching/register",
            [Document(tensor=stamp, tags={"label": "stamp"})],
            return_responses=True,
        )
        results = reg.parameters["__results__"]
        assert any(r.get("registered") == ["stamp"] for r in results.values())
        docs = client.post(
            "/document/matcher",
            [Document(tensor=page)],
            parameters={"score_threshold": 0.7},
        )
        matches = docs[0].tags["matches"]
        assert matches, "no matches returned"
        m = matches[0]
        assert m["label"] == "stamp"
        x, y, w, h = m["bbox"]
        # localized on the stamp (tolerance for peak quantization)
        assert abs(x - 96) <= 8 and abs(y - 64) <= 8, m
