"""Conditional routing (reference per-node conditions / Flow when=...)."""

import pytest

from marie_tpu.clients import Client
from marie_tpu.orchestrate.flow import Flow
from marie_tpu.serve.runtimes.gateway.conditions import doc_matches
from marie_tpu.types.docs import Document
from tests.integration.executors import UpperExecutor


def test_doc_matches_operators():
    d = Document(text="hello", tags={"type": "invoice", "pages": 3})
    assert doc_matches(d, None)
    assert doc_matches(d, {"tags__type": "invoice"})
    assert not doc_matches(d, {"tags__type": "letter"})
    assert doc_matches(d, {"tags__type": {"$in": ["invoice", "claim"]}})
    assert doc_matches(d, {"tags__pages": {"$gte": 3}})
    assert not doc_matches(d, {"tags__pages": {"$gt": 3}})
    assert doc_matches(d, {"tags__missing": {"$exists": False}})
    assert doc_matches(d, {"tags__type": {"$exists": True}})
    assert doc_matches(d, {"text": "hello"})
    assert doc_matches(d, {"tags__type": {"$ne": "letter"}})
    with pytest.raises(ValueError):
        doc_matches(d, {"tags__type": {"$regex": "x"}})


def test_flow_conditional_routing():
    flow = Flow().add(
        uses=UpperExecutor, name="upper",
        when={"tags__route": "upper"},
    )
    with flow:
        client = Client(port=flow.port_gateway)
        docs = client.post(
            "/default",
            [
                Document(text="yes", tags={"route": "upper"}),
                Document(text="no", tags={"route": "other"}),
            ],
        )
        texts = sorted(docs.texts)
        assert texts == ["YES", "no"]  # only the matching doc was processed
