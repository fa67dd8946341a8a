"""GenEval / DPG sweep drivers (showo_tpu/evaluation/geneval.py)."""

import json
import os

import jax
import numpy as np
import pytest

from showo_tpu.evaluation.geneval import run_dpg_sweep, run_geneval_sweep


class DummyPipeline:
    def __init__(self):
        self.calls = []

    def generate(self, prompts, key):
        self.calls.append(list(prompts))
        return np.random.RandomState(len(self.calls)).uniform(
            -1, 1, (len(prompts), 8, 8, 3)).astype(np.float32)


def test_geneval_sweep_layout(tmp_path):
    meta_file = tmp_path / "meta.jsonl"
    with open(meta_file, "w") as f:
        for i in range(3):
            f.write(json.dumps({"prompt": f"prompt {i}", "tag": "color"}) + "\n")
    pipe = DummyPipeline()
    run_geneval_sweep(pipe, str(meta_file), str(tmp_path / "out"),
                      batch_size=2, device_id=0, num_devices=1)
    assert len(pipe.calls) == 3
    for i in range(3):
        d = tmp_path / "out" / f"{i:05d}"
        assert sorted(os.listdir(d / "samples")) == ["00000.png", "00001.png"]
        meta = json.loads((d / "metadata.jsonl").read_text())
        assert meta["prompt"] == f"prompt {i}"


def test_geneval_sweep_sharding(tmp_path):
    meta_file = tmp_path / "meta.jsonl"
    with open(meta_file, "w") as f:
        for i in range(5):
            f.write(json.dumps({"prompt": str(i)}) + "\n")
    pipe = DummyPipeline()
    run_geneval_sweep(pipe, str(meta_file), str(tmp_path / "out"),
                      batch_size=1, device_id=1, num_devices=2)
    # shard 1 of 2 over 5 prompts -> indices {3, 4}
    assert len(pipe.calls) == 2
    assert sorted(os.listdir(tmp_path / "out")) == ["00003", "00004"]


def test_dpg_sweep_grid(tmp_path):
    pdir = tmp_path / "prompts"
    os.makedirs(pdir)
    for name in ("a", "b"):
        (pdir / f"{name}.txt").write_text(f"a photo of {name}")
    pipe = DummyPipeline()
    run_dpg_sweep(pipe, str(pdir), str(tmp_path / "out"), batch_size=4,
                  device_id=0, num_devices=1)
    from PIL import Image

    for name in ("a", "b"):
        im = Image.open(tmp_path / "out" / f"{name}.png")
        assert im.size == (16, 16)  # 2x2 grid of 8x8


def test_mmu_eval_scoring_and_sweep(tmp_path):
    from PIL import Image

    from showo_tpu.evaluation.mmu_eval import (normalize_answer, run_mmu_eval,
                                               score_predictions)

    assert normalize_answer("The  Cat!") == "cat"
    m = score_predictions([
        {"prediction": "a red ball", "answer": "red ball"},
        {"prediction": "two dogs playing", "answer": "dogs"},
        {"prediction": "blue", "answer": "green"},
    ])
    assert m["exact_match"] == 1 / 3
    assert m["contains"] == 2 / 3

    imdir = tmp_path / "imgs"
    imdir.mkdir()
    for i in range(2):
        Image.new("RGB", (16, 16), (i * 100, 0, 0)).save(imdir / f"{i}.png")
    ej = tmp_path / "eval.jsonl"
    with open(ej, "w") as f:
        for i in range(2):
            f.write(json.dumps({"image": f"{i}.png", "question": "color?",
                                "answer": "red"}) + "\n")

    class Pipe:
        resolution = 16

        def answer(self, img, q, key):
            return [1, 2]

        def decode(self, toks):
            return "red"

    metrics = run_mmu_eval(Pipe(), str(ej), str(imdir), str(tmp_path / "o"),
                           device_id=0, num_devices=1)
    assert metrics == {"num": 2, "exact_match": 1.0, "contains": 1.0}
    assert (tmp_path / "o" / "predictions_0.jsonl").exists()


def test_dpg_scoring(tmp_path):
    """DPG scoring harness (compute_dpg_bench.py equivalent): csv parsing,
    dependency zeroing, category summaries, with a deterministic fake
    scorer."""
    import csv as _csv

    from PIL import Image

    from showo_tpu.evaluation.dpg_bench import (
        compute_dpg_one_sample,
        prepare_dpg_data,
        run_dpg_scoring,
    )

    rows = [
        # the reference skips the FIRST data row (iterrows i==0 quirk)
        dict(item_id="skipme", proposition_id="1", dependency="0",
             tuple="entity - junk", question_natural_language="junk?"),
        dict(item_id="img_a", proposition_id="1", dependency="0",
             tuple="entity - whole (dog)",
             question_natural_language="is there a dog?"),
        dict(item_id="img_a", proposition_id="2", dependency="1",
             tuple="attribute - color (dog, red)",
             question_natural_language="is the dog red?"),
        dict(item_id="img_a", proposition_id="3", dependency="0",
             tuple="entity - whole (tree)",
             question_natural_language="is there a tree?"),
    ]
    csv_path = tmp_path / "dpg.csv"
    with open(csv_path, "w", newline="") as f:
        w = _csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    qd = prepare_dpg_data(str(csv_path))
    assert set(qd) == {"img_a"}
    assert qd["img_a"]["qid2dependency"] == {1: [0], 2: [1], 3: [0]}

    img_root = tmp_path / "imgs"
    img_root.mkdir()
    Image.new("RGB", (32, 32), (200, 10, 10)).save(img_root / "img_a.png")

    # scorer: dog absent -> the dependent color question (answered yes)
    # must be ZEROED by the dependency chain; tree present
    answers = {"is there a dog?": "no", "is the dog red?": "yes",
               "is there a tree?": "yes"}
    scorer = lambda image, q: answers[q]
    score, qid2tuple, qid2scores = compute_dpg_one_sample(
        qd, str(img_root / "img_a.png"), scorer, resolution=32, pic_num=1)
    assert score == pytest.approx(1 / 3)  # only the tree survives
    assert qid2scores == {1: 0.0, 2: 1.0, 3: 1.0}  # pre-dependency scores

    out = run_dpg_scoring(str(img_root), str(csv_path), scorer,
                          resolution=32, process_index=0, process_count=1)
    assert out["n"] == 1
    assert out["score"] == pytest.approx(100 / 3)
    assert out["l1"]["entity"] == pytest.approx(50.0)  # dog 0, tree 1
    assert out["l2"]["attribute - color"] == pytest.approx(100.0)
    assert (img_root / "dpg_results.txt").exists()
    assert (img_root / "dpg_results_detail.txt").exists()
