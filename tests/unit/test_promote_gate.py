"""Decision logic of the checkpoint promotion gate
(scripts/promote_checkpoint.py) — scoring and guardrails are pure
functions; the swap/rollback protocol is exercised with stub oracles."""

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load():
    spec = importlib.util.spec_from_file_location(
        "promote_checkpoint",
        os.path.join(REPO, "scripts", "promote_checkpoint.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def gate():
    return _load()


def test_recognizer_score_is_negative_mean_cer(gate):
    table = {
        "in_dist/greedy": {"cer": 0.0, "detection_recall": 1, "detection_iou": 0.8},
        "ood_rotate/greedy": {"cer": 0.02, "detection_recall": 1, "detection_iou": 0.8},
        "ood_rotate/beam5": {"cer": 0.5, "detection_recall": 1, "detection_iou": 0.8},
    }
    s, detail = gate.score("recognizer", table)
    assert s == pytest.approx(-0.01)
    assert detail == {"in_dist": 0.0, "ood_rotate": 0.02}  # greedy rows only


def test_guard_rejects_per_dist_regression(gate):
    cur = {"in_dist": 0.0, "ood_rotate": 0.02}
    cand = {"in_dist": 0.02, "ood_rotate": 0.0}  # mean improves, in_dist regresses
    ok, regress = gate.guard_ok("recognizer", cur, cand, max_regress=0.005)
    assert not ok
    assert "in_dist" in regress
    ok2, _ = gate.guard_ok("recognizer", cur, cand, max_regress=0.02)
    assert ok2


def test_guard_floor_tolerates_hairline_regression_vs_memorizer(gate):
    """The round-4 v6 postmortem: an incumbent that memorized its home
    distributions (CER ~0) must not veto a vastly-better candidate over a
    hairline row below the capability floor — but a row genuinely above
    floor + max_regress still vetoes."""
    cur = {"dist_serif": 0.0, "ood_lexicon": 0.84}
    # candidate reads novel words, pays 0.0054 on the memorized row:
    cand = {"dist_serif": 0.0054, "ood_lexicon": 0.009}
    ok, regress = gate.guard_ok("recognizer", cur, cand, max_regress=0.005)
    assert ok, regress  # 0.0054 <= max(0.0, floor=0.01) + 0.005

    # above floor + tolerance the veto still bites
    cand_bad = {"dist_serif": 0.016, "ood_lexicon": 0.009}
    ok, regress = gate.guard_ok("recognizer", cur, cand_bad, max_regress=0.005)
    assert not ok and "dist_serif" in regress

    # rows where the incumbent is above the floor stay incumbent-relative
    cur2 = {"ood_noise": 0.05}
    ok, regress = gate.guard_ok(
        "recognizer", cur2, {"ood_noise": 0.054}, max_regress=0.005
    )
    assert ok
    ok, regress = gate.guard_ok(
        "recognizer", cur2, {"ood_noise": 0.06}, max_regress=0.005
    )
    assert not ok and "ood_noise" in regress

    # floor can be disabled for strict incumbent-relative gating
    ok, regress = gate.guard_ok(
        "recognizer", cur, cand, max_regress=0.005, guard_floor=0.0
    )
    assert not ok and "dist_serif" in regress


def test_detector_detail_carries_detection_metrics(gate):
    table = {
        "in_dist/greedy": {"cer": 0.0, "detection_recall": 1.0, "detection_iou": 0.8},
        "ood_dense/greedy": {"cer": 0.85, "detection_recall": 0.72, "detection_iou": 0.7},
    }
    _, detail = gate.score("detector", table)
    assert detail["ood_dense"] == {"cer": 0.85, "recall": 0.72, "iou": 0.7}


def test_detector_guard_ignores_blind_recognizer_cer_noise(gate):
    """CER noise on rows the current recognizer cannot read (CER > 0.1)
    must not veto a detection improvement; recall regressions must."""
    cur = {
        "in_dist": {"cer": 0.0, "recall": 1.0, "iou": 0.8},
        "ood_lexicon": {"cer": 0.8329, "recall": 0.98, "iou": 0.7},
    }
    cand_noise = {
        "in_dist": {"cer": 0.0, "recall": 1.0, "iou": 0.8},
        "ood_lexicon": {"cer": 0.8399, "recall": 0.99, "iou": 0.7},
    }
    ok, regress = gate.guard_ok("detector", cur, cand_noise, max_regress=0.005)
    assert ok, regress

    cand_recall_drop = {
        "in_dist": {"cer": 0.0, "recall": 0.95, "iou": 0.8},
        "ood_lexicon": {"cer": 0.8329, "recall": 0.98, "iou": 0.7},
    }
    ok, regress = gate.guard_ok("detector", cur, cand_recall_drop, max_regress=0.005)
    assert not ok and "in_dist/recall" in regress

    cand_readable_cer_regress = {
        "in_dist": {"cer": 0.02, "recall": 1.0, "iou": 0.8},
        "ood_lexicon": {"cer": 0.8329, "recall": 0.98, "iou": 0.7},
    }
    ok, regress = gate.guard_ok(
        "detector", cur, cand_readable_cer_regress, max_regress=0.005
    )
    assert not ok and "in_dist/cer" in regress


def test_boundary_score_prefers_iou_and_recovery(gate):
    better = {"model/boundary": {
        "mean_quad_iou": 0.95, "corner_mae_px": 1.0, "cer_after_fit_to_page": 0.01,
    }}
    worse = {"model/boundary": {
        "mean_quad_iou": 0.93, "corner_mae_px": 4.0, "cer_after_fit_to_page": 0.05,
    }}
    sb, _ = gate.score("boundary", better)
    sw, _ = gate.score("boundary", worse)
    assert sb > sw


def test_textfusenet_score(gate):
    row = {"detector/textfusenet": {
        "detection_recall": 0.9, "detection_precision": 0.8, "detection_iou": 0.8,
    }}
    s, _ = gate.score("textfusenet", row)
    assert s == pytest.approx(0.9 + 0.4 + 0.4)


def test_swap_protocol_rolls_back_on_reject(gate, tmp_path, monkeypatch):
    """End-to-end gate run with a stubbed oracle: the candidate is worse,
    so the original checkpoint must be restored and the stage parked."""
    zoo = tmp_path / "model_zoo"
    zoo.mkdir()
    (zoo / "m-synth").mkdir()
    (zoo / "m-synth" / "w").write_text("CURRENT")
    stage = zoo / "m-stage"
    stage.mkdir()
    (stage / "w").write_text("CANDIDATE")

    monkeypatch.setattr(gate, "ZOO", str(zoo))
    calls = []

    def fake_oracle(kind, pages, seed, timeout_s):
        live = (zoo / "m-synth" / "w").read_text()
        calls.append(live)
        cer = 0.0 if live == "CURRENT" else 0.5
        return {"in_dist/greedy": {"cer": cer}}

    monkeypatch.setattr(gate, "run_oracle", fake_oracle)
    monkeypatch.setattr(
        sys, "argv",
        ["promote_checkpoint.py", "--kind", "recognizer",
         "--stage", str(stage), "--target", "m-synth"],
    )
    rc = gate.main()
    assert rc == 3  # rejected
    assert calls == ["CURRENT", "CANDIDATE"]  # swap really happened
    assert (zoo / "m-synth" / "w").read_text() == "CURRENT"  # rolled back
    assert (tmp_path / "model_zoo" / "m-stage-rejected" / "w").read_text() == "CANDIDATE"
    assert not (zoo / "m-synth-demoted").exists()


def test_swap_protocol_promotes_on_improvement(gate, tmp_path, monkeypatch):
    zoo = tmp_path / "model_zoo"
    zoo.mkdir()
    (zoo / "m-synth").mkdir()
    (zoo / "m-synth" / "w").write_text("CURRENT")
    stage = zoo / "m-stage"
    stage.mkdir()
    (stage / "w").write_text("CANDIDATE")

    monkeypatch.setattr(gate, "ZOO", str(zoo))

    def fake_oracle(kind, pages, seed, timeout_s):
        live = (zoo / "m-synth" / "w").read_text()
        return {"in_dist/greedy": {"cer": 0.3 if live == "CURRENT" else 0.0}}

    monkeypatch.setattr(gate, "run_oracle", fake_oracle)
    monkeypatch.setattr(
        sys, "argv",
        ["promote_checkpoint.py", "--kind", "recognizer",
         "--stage", str(stage), "--target", "m-synth"],
    )
    rc = gate.main()
    assert rc == 0
    assert (zoo / "m-synth" / "w").read_text() == "CANDIDATE"
    assert (zoo / "m-synth-prev" / "w").read_text() == "CURRENT"


def test_candidate_eval_failure_rolls_back(gate, tmp_path, monkeypatch):
    zoo = tmp_path / "model_zoo"
    zoo.mkdir()
    (zoo / "m-synth").mkdir()
    (zoo / "m-synth" / "w").write_text("CURRENT")
    stage = zoo / "m-stage"
    stage.mkdir()
    (stage / "w").write_text("CANDIDATE")

    monkeypatch.setattr(gate, "ZOO", str(zoo))
    state = {"n": 0}

    def fake_oracle(kind, pages, seed, timeout_s):
        state["n"] += 1
        if state["n"] == 2:
            raise RuntimeError("relay glitch")
        return {"in_dist/greedy": {"cer": 0.1}}

    monkeypatch.setattr(gate, "run_oracle", fake_oracle)
    monkeypatch.setattr(
        sys, "argv",
        ["promote_checkpoint.py", "--kind", "recognizer",
         "--stage", str(stage), "--target", "m-synth"],
    )
    rc = gate.main()
    assert rc == 4
    assert (zoo / "m-synth" / "w").read_text() == "CURRENT"
    assert (stage / "w").read_text() == "CANDIDATE"  # stage restored in place


def test_new_slot_require_eval_ab(gate, tmp_path, monkeypatch):
    """--require-eval on an empty slot A/Bs the ladder with vs without
    the new checkpoint and rejects a regression."""
    zoo = tmp_path / "model_zoo"
    zoo.mkdir()
    stage = zoo / "new-stage"
    stage.mkdir()
    (stage / "w").write_text("NEW")

    monkeypatch.setattr(gate, "ZOO", str(zoo))

    def fake_oracle(kind, pages, seed, timeout_s):
        present = (zoo / "new-synth").exists()
        return {"in_dist/greedy": {"cer": 0.4 if present else 0.1}}

    monkeypatch.setattr(gate, "run_oracle", fake_oracle)
    monkeypatch.setattr(
        sys, "argv",
        ["promote_checkpoint.py", "--kind", "recognizer",
         "--stage", str(stage), "--target", "new-synth", "--require-eval"],
    )
    rc = gate.main()
    assert rc == 3
    assert not (zoo / "new-synth").exists()  # slot stays empty
    assert (zoo / "new-stage-rejected" / "w").read_text() == "NEW"

    # improvement case: slot adopted
    stage.mkdir()
    (stage / "w").write_text("NEW")

    def fake_oracle2(kind, pages, seed, timeout_s):
        present = (zoo / "new-synth").exists()
        return {"in_dist/greedy": {"cer": 0.01 if present else 0.1}}

    monkeypatch.setattr(gate, "run_oracle", fake_oracle2)
    rc = gate.main()
    assert rc == 0
    assert (zoo / "new-synth" / "w").read_text() == "NEW"
