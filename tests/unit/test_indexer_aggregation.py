"""Entity aggregation + validation (reference indexer post-processing:
group_by_line / aggregate_groups_by_line / group_composite_entities /
validators — transformers.py:703-1270, validator.py)."""

import numpy as np
import pytest

from marie_tpu.components.document_indexer.aggregation import (
    aggregate_lines,
    group_composites,
    group_predictions_by_line,
    key_spans,
    merge_mislabeled,
)
from marie_tpu.components.document_indexer.validator import (
    AddressValidator,
    AmountValidator,
    DateValidator,
    PhoneValidator,
    get_validator,
)

# page layout: two lines; line 1 has NAME NAME AMT; line 2 has STREET x2
LINES = [[10, 10, 400, 20], [10, 40, 400, 20]]
BOXES = [
    [10, 10, 60, 18],   # 0 NAME
    [80, 10, 60, 18],   # 1 NAME
    [200, 10, 70, 18],  # 2 AMOUNT
    [10, 40, 90, 18],   # 3 STREET
    [110, 40, 70, 18],  # 4 STREET
]
PREDS = ["B-NAME", "I-NAME", "B-AMOUNT", "B-STREET", "I-STREET"]
SCORES = [0.9, 0.8, 0.95, 0.85, 0.9]


def test_group_predictions_by_line():
    groups = group_predictions_by_line(LINES, BOXES, PREDS)
    assert groups == {1: [0, 1, 2], 2: [3, 4]}


def test_group_by_line_drops_O_and_degenerate():
    preds = ["O", "B-NAME"]
    boxes = [[10, 10, 60, 18], [80, 10, 0, 0]]
    assert group_predictions_by_line(LINES, boxes, preds) == {}


def test_key_spans_contiguous_runs():
    idxs = [0, 1, 2]
    assert key_spans(idxs, PREDS, "NAME") == [[0, 1]]
    assert key_spans(idxs, PREDS, "AMOUNT") == [[2]]
    # split run: NAME AMOUNT NAME -> two NAME spans
    preds = ["B-NAME", "B-AMOUNT", "B-NAME"]
    assert key_spans([0, 1, 2], preds, "NAME") == [[0], [2]]


def test_aggregate_lines_merges_span_geometry():
    groups = group_predictions_by_line(LINES, BOXES, PREDS)
    agg = aggregate_lines(["NAME", "AMOUNT"], groups, BOXES, PREDS, SCORES)
    names = [g for g in agg[1] if g.key == "NAME"]
    assert len(names) == 1
    assert names[0].bbox == [10, 10, 130, 18]  # union of boxes 0+1
    assert names[0].score == pytest.approx(0.85, abs=1e-6)
    assert names[0].word_indexes == [0, 1]


def test_merge_mislabeled_unions_overlapping_fragments():
    # B-PAN I-PAN [mislabel] I-PAN -> two PAN groups overlapping in x
    boxes = [[10, 10, 50, 18], [70, 10, 50, 18], [40, 10, 120, 18]]
    preds = ["B-PAN", "B-OTHER", "B-PAN"]
    scores = [0.9, 0.5, 0.7]
    groups = group_predictions_by_line(LINES, boxes, preds)
    agg = aggregate_lines(["PAN"], groups, boxes, preds, scores)
    assert len([g for g in agg[1] if g.key == "PAN"]) == 2
    fixed = merge_mislabeled(["PAN"], agg)
    pans = [g for g in fixed[1] if g.key == "PAN"]
    assert len(pans) == 1
    assert pans[0].bbox == [10, 10, 150, 18]


def test_group_composites_multiline_entity():
    definitions = [{"name": "PATIENT", "entities": ["NAME", "STREET"]}]
    groups = group_composites(definitions, LINES, BOXES, PREDS, SCORES)
    assert "PATIENT" in groups
    egs = groups["PATIENT"]
    assert len(egs) == 1  # lines 1+2 within max_line_gap
    eg = egs[0]
    assert sorted(eg.components) == ["NAME", "STREET"]
    # bbox spans both lines
    assert eg.bbox[1] == 10 and eg.bbox[1] + eg.bbox[3] == 58


def test_group_composites_splits_distant_lines():
    # five page lines; NAME words on lines 1 and 5 (gap 4 > max_line_gap)
    lines = [[10, 10 + 70 * i, 400, 20] for i in range(5)]
    boxes = [[10, 10, 60, 18], [10, 290, 60, 18]]
    preds = ["B-NAME", "B-NAME"]
    scores = [0.9, 0.9]
    groups = group_composites(
        [{"name": "G", "entities": ["NAME"]}], lines, boxes, preds, scores
    )
    assert len(groups["G"]) == 2  # far apart -> two entities


def test_date_validator():
    v = DateValidator()
    assert v("11/02/2023") == "2023-11-02"
    assert v("2023-11-02") == "2023-11-02"
    assert v("Nov 2, 2023") == "2023-11-02"
    with pytest.raises(ValueError):
        v("not a date")


def test_amount_validator():
    v = AmountValidator()
    assert v("$1,500.25") == "1500.25"
    assert v("375.2") == "375.20"
    assert v("(42.00)") == "-42.00"
    with pytest.raises(ValueError):
        v("12 apples")


def test_phone_validator():
    v = PhoneValidator()
    assert v("(312) 555-0199") == "3125550199"
    assert v("+1 312 555 0199") == "3125550199"
    with pytest.raises(ValueError):
        v("555-0199")


def test_address_validator():
    v = AddressValidator()
    parsed = v("123 Main St, Springfield, IL 62704")
    assert parsed["address1"] == "123 Main St"
    assert parsed["city"] == "Springfield"
    assert parsed["state"] == "IL"
    assert parsed["zip_code"] == "62704"
    with pytest.raises(ValueError):
        v("no address here")
    with pytest.raises(ValueError):
        v("123 Main St, Springfield, ZZ 62704")  # bad state


def test_validator_registry():
    assert get_validator("date") is not None
    assert get_validator("AMOUNT") is not None
    assert get_validator("UNKNOWN_LABEL") is None


def test_indexer_end_to_end_groups_and_validates():
    """Full path: indexer.index with composite definitions + validators
    on an untrained model — machinery only (labels come out of argmax of
    random weights, so we inject predictions via a tiny label set where
    every prediction maps to a real label)."""
    from marie_tpu.components.base import PageInput
    from marie_tpu.components.document_indexer.layoutlm_indexer import (
        LayoutDocumentIndexer,
    )
    from marie_tpu.models.configs import LayoutLMConfig

    labels = ("O", "B-DATE", "I-DATE")
    idx = LayoutDocumentIndexer(
        labels=labels,
        config=LayoutLMConfig.synth(num_labels=len(labels)),
    )
    page = PageInput(
        words=["11/02/2023", "total"],
        boxes=[[10, 10, 80, 16], [100, 10, 50, 16]],
        page_size=(768, 1024),
    )
    out = idx.index(
        [page], entities_to_group=[{"name": "DATES", "entities": ["DATE"]}]
    )
    assert len(out) == 1
    for e in out[0]["entities"]:
        assert e["label"] in ("DATE",)
        assert "valid" in e  # DATE validator ran
    assert "groups" in out[0] or not out[0]["entities"]
