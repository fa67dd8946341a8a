"""Scoring-protocol tests for the lmms-eval-grade MMU benchmark scorers
(evaluation/lmms_benchmarks.py): each benchmark's published math on
hand-computed fixtures."""

import pytest

from showo_tpu.evaluation.lmms_benchmarks import (
    parse_multi_choice,
    parse_yes_no,
    score_benchmark,
    score_gqa,
    score_mme,
    score_mmmu,
    score_pope,
)


def test_parse_yes_no():
    assert parse_yes_no("Yes") == "yes"
    assert parse_yes_no("no, it is not.") == "no"
    assert parse_yes_no("Yes. The image shows a cat.") == "yes"
    assert parse_yes_no("maybe") == "other"
    assert parse_yes_no("I cannot say") == "other"


def test_mme_acc_plus_semantics():
    # image A: both right; image B: one right -> acc 3/4, acc+ 1/2
    items = [
        {"question_id": "A", "answer": "yes", "prediction": "Yes",
         "category": "existence"},
        {"question_id": "A", "answer": "no", "prediction": "No",
         "category": "existence"},
        {"question_id": "B", "answer": "yes", "prediction": "yes",
         "category": "existence"},
        {"question_id": "B", "answer": "no", "prediction": "yes",
         "category": "existence"},
    ]
    out = score_mme(items)
    ex = out["existence"]
    assert ex["acc"] == pytest.approx(0.75)
    assert ex["acc_plus"] == pytest.approx(0.5)
    assert ex["score"] == pytest.approx((0.75 + 0.5) * 100)
    assert out["total"]["score"] == pytest.approx(ex["score"])


def test_mme_total_sums_categories():
    items = [
        {"question_id": "A", "answer": "yes", "prediction": "yes",
         "category": "color"},
        {"question_id": "B", "answer": "no", "prediction": "no",
         "category": "count"},
    ]
    out = score_mme(items)
    assert out["total"]["score"] == pytest.approx(
        out["color"]["score"] + out["count"]["score"])


def test_pope_f1():
    # TP=2 FP=1 TN=1 FN=1 -> prec 2/3, rec 2/3, f1 2/3
    items = [
        {"answer": "yes", "prediction": "yes"},
        {"answer": "yes", "prediction": "Yes, it is"},
        {"answer": "yes", "prediction": "no"},
        {"answer": "no", "prediction": "yes"},
        {"answer": "no", "prediction": "no"},
    ]
    out = score_pope(items)
    assert out["precision"] == pytest.approx(2 / 3)
    assert out["recall"] == pytest.approx(2 / 3)
    assert out["f1"] == pytest.approx(2 / 3)
    assert out["accuracy"] == pytest.approx(3 / 5)
    assert out["yes_ratio"] == pytest.approx(3 / 5)


def test_gqa_normalized_exact_match():
    items = [
        {"answer": "the cat", "prediction": "Cat."},     # article + period
        {"answer": "left", "prediction": "on the left"},  # NOT exact
    ]
    out = score_gqa(items)
    assert out["accuracy"] == pytest.approx(0.5)


def test_mmmu_letter_and_text_fallback():
    opts = ["a red car", "a blue boat", "a green tree"]
    assert parse_multi_choice("(B)", opts) == "B"
    assert parse_multi_choice("The answer is C because...", opts) == "C"
    assert parse_multi_choice("it shows a blue boat", opts) == "B"
    # two option texts present -> ambiguous -> wrong
    assert parse_multi_choice("a red car or a blue boat", opts) == ""
    out = score_mmmu([
        {"answer": "B", "options": opts, "prediction": "B"},
        {"answer": "A", "options": opts, "prediction": "a green tree"},
    ])
    assert out["accuracy"] == pytest.approx(0.5)


def test_dispatch_and_unknown():
    assert score_benchmark("gqa", [{"answer": "x", "prediction": "x"}])[
        "accuracy"] == 1.0
    with pytest.raises(ValueError):
        score_benchmark("nope", [])


def test_run_mmu_eval_benchmark_path(tmp_path):
    """The sweep carries benchmark fields through and applies the
    protocol scorer (pipeline stubbed)."""
    import json

    import numpy as np
    from PIL import Image

    from showo_tpu.evaluation.mmu_eval import run_mmu_eval

    imdir = tmp_path / "img"
    imdir.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(imdir / "a.png")
    ej = tmp_path / "eval.jsonl"
    with open(ej, "w") as f:
        for qid, ans in (("A", "yes"), ("A", "no")):
            f.write(json.dumps({
                "image": "a.png", "question": f"is it {ans}?",
                "answer": ans, "question_id": qid,
                "category": "existence"}) + "\n")

    class Pipe:
        resolution = 8

        def answer(self, img, question, key):
            return "yes"

        def decode(self, toks):
            return toks

    out = run_mmu_eval(Pipe(), str(ej), str(imdir), str(tmp_path / "o"),
                       device_id=0, num_devices=1, benchmark="mme")
    assert out["existence"]["acc"] == pytest.approx(0.5)
    assert out["existence"]["acc_plus"] == pytest.approx(0.0)
