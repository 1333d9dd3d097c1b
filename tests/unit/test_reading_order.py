"""Reading-order model (LayoutReader analog) — generator, loss, API,
and trained-checkpoint quality.

Reference parity target: ``marie/document/layoutreader/text_layout.py``
(``TextLayout.forward(words, boxes) -> list[int]``).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from marie_tpu.models.reading_order import (
    ReadingOrderConfig,
    ReadingOrderModel,
    TextLayout,
)
from marie_tpu.train.reading_order import (
    gen_page,
    kendall_tau,
    make_batch,
    pairwise_rank_loss,
)

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_gen_page_valid_geometry():
    rng = np.random.default_rng(0)
    for _ in range(20):
        boxes, n = gen_page(rng, 128)
        assert 2 <= n <= 128
        b = boxes[:n]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        assert b.min() >= -0.01 and b.max() <= 1.01
        # pads are zero
        assert not boxes[n:].any()


def test_make_batch_ranks_are_permutations():
    rng = np.random.default_rng(1)
    boxes, ranks, n_valid = make_batch(rng, 4, 64)
    for b in range(4):
        n = int(n_valid[b])
        assert sorted(ranks[b, :n].tolist()) == list(range(n))
        assert (ranks[b, n:] > 64).all()


def test_pairwise_loss_ignores_pads():
    # two identical pages, one padded with garbage rank rows — same loss
    rng = np.random.default_rng(2)
    boxes, ranks, n_valid = make_batch(rng, 1, 32)
    scores = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32)), jnp.float32)
    l1, a1 = pairwise_rank_loss(scores, jnp.asarray(ranks), jnp.asarray(n_valid))
    boxes2 = boxes.copy()
    boxes2[0, int(n_valid[0]):] = 0.77  # garbage in pad rows
    l2, a2 = pairwise_rank_loss(scores, jnp.asarray(ranks), jnp.asarray(n_valid))
    assert float(l1) == pytest.approx(float(l2))
    assert float(a1) == pytest.approx(float(a2))


def test_text_layout_returns_permutation_and_handles_empty():
    tl = TextLayout(ReadingOrderConfig.tiny())
    assert tl.forward([], []) == []
    boxes = [[10, 10, 100, 40], [10, 500, 100, 540], [500, 10, 600, 40]]
    order = tl.forward(["a", "b", "c"], boxes)
    assert sorted(order) == [0, 1, 2]
    words, obs = tl.reconstruct(["a", "b", "c"], boxes)
    assert sorted(words) == ["a", "b", "c"] and len(obs) == 3


def test_text_layout_chunks_long_pages():
    cfg = ReadingOrderConfig.tiny()
    tl = TextLayout(cfg)
    n = cfg.max_boxes * 2 + 7  # forces the banded-chunk path
    rng = np.random.default_rng(4)
    boxes = []
    for i in range(n):
        x0 = rng.uniform(0, 900)
        y0 = (i / n) * 950
        boxes.append([x0, y0, x0 + 50, y0 + 12])
    order = tl.order(boxes)
    assert sorted(order) == list(range(n))


def test_kendall_tau_bounds():
    ident = np.arange(5)
    assert kendall_tau(ident, ident) == 1.0
    assert kendall_tau(ident[::-1].copy(), ident) == -1.0


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REPO, "model_zoo", "reading-order-synth")),
    reason="trained checkpoint not present",
)
def test_trained_checkpoint_orders_columns():
    """The trained ranker must read a two-column page column-by-column —
    the case plain y-sort gets wrong — and score >0.85 mean tau."""
    from marie_tpu.document.layoutreader import load_text_layout
    from marie_tpu.train.reading_order import evaluate_reading_order

    tl = load_text_layout()
    tau = evaluate_reading_order(tl.model, tl.params, tl.cfg, pages=32, seed=123)
    assert tau > 0.85, f"mean kendall tau {tau}"

    # hand-built two-column page: left column rows 0..4, right rows 5..9
    boxes = []
    for r in range(5):
        boxes.append([60, 60 + r * 90, 400, 90 + r * 90])
    for r in range(5):
        boxes.append([560, 60 + r * 90, 900, 90 + r * 90])
    order = tl.order(boxes)
    # left column must be read entirely before the right column
    pos = {i: k for k, i in enumerate(order)}
    assert max(pos[i] for i in range(5)) < min(pos[i] for i in range(5, 10))


def test_reorder_page_result_remaps_ids_and_lines():
    from marie_tpu.document.layoutreader import reorder_page_result

    tl = TextLayout(ReadingOrderConfig.tiny())
    result = {
        "meta": {"imageSize": {"width": 1000, "height": 1000}},
        "words": [
            {"id": 0, "text": "w0", "box": [10, 10, 80, 20], "line": 1, "confidence": 1.0},
            {"id": 1, "text": "w1", "box": [10, 200, 80, 20], "line": 2, "confidence": 1.0},
            {"id": 2, "text": "w2", "box": [200, 10, 80, 20], "line": 1, "confidence": 1.0},
        ],
        "lines": [
            {"line": 1, "wordids": [0, 2], "text": "w0 w2", "bbox": [10, 10, 270, 20], "confidence": 1.0},
            {"line": 2, "wordids": [1], "text": "w1", "bbox": [10, 200, 80, 20], "confidence": 1.0},
        ],
    }
    out = reorder_page_result(result, tl)
    assert sorted(w["id"] for w in out["words"]) == [0, 1, 2]
    assert sorted(w["text"] for w in out["words"]) == ["w0", "w1", "w2"]
    by_id = {w["id"]: w["text"] for w in out["words"]}
    for line in out["lines"]:
        assert line["text"] == " ".join(by_id[i] for i in line["wordids"])
    # single/empty word results pass through untouched
    tiny = {"meta": result["meta"], "words": result["words"][:1], "lines": []}
    assert reorder_page_result(tiny, tl) is tiny
