"""Every shipped YAML config is loadable and constructs its model/trainer
config objects (the reference ships 33 configs: /root/reference/configs/ 15
+ /root/reference/show-o2/configs/ 18; this repo mirrors the family in its
own schema)."""

import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL = sorted(os.path.basename(p)
             for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))
V1 = [c for c in ALL if c.startswith("showo_")]
V2 = [c for c in ALL if c.startswith("showo2_")]


def _load(name):
    from showo_tpu.config import load_config

    return load_config(os.path.join(CONFIG_DIR, name))


def test_family_complete():
    """33 configs, one per reference YAML."""
    assert len(ALL) == 33, ALL
    ref_v1 = 15
    ref_v2 = 18
    assert len(V1) == ref_v1, V1
    assert len(V2) == ref_v2, V2


@pytest.mark.parametrize("name", V1)
def test_v1_config_constructs(name):
    from fake_tokenizer import FakeTokenizer

    from showo_tpu.inference_t2i import build_showo_config
    from showo_tpu.prompting import UniversalPrompting
    from showo_tpu.training.train_step import TrainConfig, make_optimizer

    config = _load(name)
    cfg = build_showo_config(config)
    assert cfg.vocab_size == 58498
    assert cfg.num_vq_tokens in (256, 1024)
    uni = UniversalPrompting(
        FakeTokenizer(),
        max_text_len=config.dataset.preprocessing.max_seq_length,
        cond_dropout_prob=config.training.cond_dropout_prob)
    assert uni is not None
    tr = config.training
    if "max_train_steps" in tr:  # training configs build an optimizer too
        lr = tr.get("learning_rate") or config.optimizer.params.learning_rate
        tc = TrainConfig(
            learning_rate=float(lr),
            max_grad_norm=tr.get("max_grad_norm", 1.0),
            max_seq_length=config.dataset.preprocessing.max_seq_length,
            grad_accum_steps=int(tr.get("gradient_accumulation_steps", 1)))
        assert make_optimizer(tc) is not None
        # every trainable v1 config names its data sources
        p = config.dataset.params
        for k in ("train_t2i_shards_path_or_url",
                  "train_mmu_shards_path_or_url",
                  "train_lm_shards_path_or_url"):
            assert p.get(k), (name, k)
    if "w_clip_vit" in name or "clip_vit" in name:
        assert config.model.showo.w_clip_vit is True
    if "512" in name:
        assert config.dataset.preprocessing.resolution == 512
        assert cfg.num_vq_tokens == 1024


@pytest.mark.parametrize("name", V2)
def test_v2_config_constructs(name):
    from showo_tpu.inference_t2i_v2 import build_showo2_config
    from showo_tpu.show_o2.train_stage_one import Stage1Config
    from showo_tpu.show_o2.transport import Transport

    config = _load(name)
    cfg = build_showo2_config(config)
    if "7b" in name:
        assert cfg.llm.hidden_size == 3584
        assert cfg.llm.num_kv_heads == 4
    else:
        assert cfg.llm.hidden_size == 1536
    n_img = config.dataset.preprocessing.num_t2i_image_tokens + (
        1 if cfg.add_time_embeds else 0)
    transport = Transport(
        snr_type=config.transport.get("snr_type", "lognorm"),
        do_shift=config.transport.get("do_shift", True), seq_len=n_img)
    assert transport.path_sampler is not None

    tr = config.training if "training" in config else None
    if tr is not None and "max_train_steps" in tr:
        if "stage_2" in name:
            from showo_tpu.show_o2.train_stage_two import Stage2Config

            sc = Stage2Config(
                lr_und=float(tr.learning_rate_ve),
                lr_fusion=float(tr.learning_rate_proj),
                lr_main=float(tr.learning_rate_showo),
                und_max_t0=tr.get("und_max_t0", 1.0))
        else:
            sc = Stage1Config(
                learning_rate=float(tr.learning_rate),
                und_max_t0=tr.get("und_max_t0", 1.0),
                grad_accum_steps=int(
                    tr.get("gradient_accumulation_steps", 1)))
        assert sc is not None
    if "mixed_modal" in name and "downstream" not in name:
        assert config.dataset.preprocessing.num_mixed_modal_tokens == 729
    if "downstream" in name:
        assert config.dataset.params.mixed_modal_json
        assert list(config.model.frozen_params)  # phase-1 freeze set
