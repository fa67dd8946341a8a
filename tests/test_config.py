"""Config system tests: YAML + dotted CLI overrides + interpolation."""

import os

from showo_tpu.config import Config, flatten_config, get_config, load_config

YAML = """
training:
  batch_size: 20
  lr: 1.0e-4
dataset:
  params:
    batch_size: ${training.batch_size}
    name: "run-${training.batch_size}"
model:
  dims: [1, 2, 3]
"""


def _write(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(YAML)
    return str(p)


def test_load_and_interpolate(tmp_path):
    cfg = load_config(_write(tmp_path))
    assert cfg.training.batch_size == 20
    assert cfg.dataset.params.batch_size == 20
    assert cfg.dataset.params.name == "run-20"
    assert cfg.model.dims == [1, 2, 3]


def test_cli_overrides(tmp_path):
    cfg = load_config(_write(tmp_path),
                      ["training.batch_size=4", "new.key=hello",
                       "training.flag=true"])
    assert cfg.training.batch_size == 4
    assert cfg.dataset.params.batch_size == 4  # interpolation sees override
    assert cfg.new.key == "hello"
    assert cfg.training.flag is True


def test_get_config_argv(tmp_path):
    path = _write(tmp_path)
    cfg = get_config([f"config={path}", "training.lr=0.5"])
    assert cfg.training.lr == 0.5
    assert cfg.config == path


def test_flatten(tmp_path):
    cfg = load_config(_write(tmp_path))
    flat = dict(flatten_config(cfg))
    assert flat["training.batch_size"] == 20
    assert flat["model.dims.1"] == 2


def test_get_path_default():
    c = Config({"a": Config({"b": 1})})
    assert c.get_path("a.b") == 1
    assert c.get_path("a.c", 7) == 7


def test_snapshot_config(tmp_path):
    import yaml

    from showo_tpu.config import load_config, snapshot_config
    from showo_tpu.utils.logging import Tracker

    src = tmp_path / "c.yaml"
    src.write_text("experiment:\n  name: run1\nmodel:\n  dim: 8\n")
    cfg = load_config(str(src), ["model.dim=16"])
    tracker = Tracker(enabled=False)
    path = snapshot_config(cfg, str(tmp_path / "out"), tracker)
    back = yaml.safe_load(open(path))
    assert back["model"]["dim"] == 16
    assert back["experiment"]["name"] == "run1"
    assert tracker.config["model.dim"] == 16
