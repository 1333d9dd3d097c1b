"""LLM-prompted NER (reference marie/subzero/gen.py analog)."""

import pytest

from marie_tpu.components.llm_ner import (
    LLMNerExtractor,
    generate_prompt,
    parse_entities,
)

LABELS = ("invoice_number", "total_amount")


def test_prompt_contains_labels_schema_and_text():
    p = generate_prompt(LABELS, "Invoice 42, total 7.00")
    assert "- invoice_number" in p and "- total_amount" in p
    assert '"invoice_number": []' in p
    assert p.rstrip().endswith("Invoice 42, total 7.00")


def test_parse_clean_json():
    out = '{"invoice_number": ["42"], "total_amount": ["7.00"]}'
    assert parse_entities(out, LABELS) == {
        "invoice_number": ["42"], "total_amount": ["7.00"],
    }


def test_parse_fenced_json_with_prose_and_extra_labels():
    out = (
        "Sure! Here are the entities:\n```json\n"
        '{"invoice_number": "42", "total_amount": [], "hallucinated": ["x"]}'
        "\n```\nHope that helps."
    )
    parsed = parse_entities(out, LABELS)
    assert parsed == {"invoice_number": ["42"], "total_amount": []}
    assert "hallucinated" not in parsed  # labels are whitelisted


def test_parse_garbage_degrades_to_empty():
    assert parse_entities("no json here", LABELS) == {
        "invoice_number": [], "total_amount": [],
    }
    assert parse_entities('{"broken": [', LABELS) == {
        "invoice_number": [], "total_amount": [],
    }


def test_extractor_with_fake_backend():
    prompts = []

    def fake(prompt: str) -> str:
        prompts.append(prompt)
        return '{"invoice_number": ["INV-1"], "total_amount": ["19.99"]}'

    ex = LLMNerExtractor(LABELS, generate_fn=fake)
    assert ex.is_available()
    out = ex.extract("INV-1 ... 19.99")
    assert out["invoice_number"] == ["INV-1"]
    assert "INV-1 ... 19.99" in prompts[0]


def test_extractor_unavailable_backend():
    ex = LLMNerExtractor(LABELS)  # no fn, no model
    assert not ex.is_available()
    with pytest.raises(RuntimeError, match="unavailable"):
        ex.extract("text")
