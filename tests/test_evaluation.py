"""GenEval / DPG sweep drivers (showo_tpu/evaluation/geneval.py)."""

import json
import os

import jax
import numpy as np

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
