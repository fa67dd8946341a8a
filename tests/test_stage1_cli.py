"""Stage-1 CLI main() end-to-end on a tiny config: config loading,
random init, jsonl dataloader, fused steps, checkpoint + loader-state
save, and resume_from_checkpoint='latest' on a second invocation."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def tiny_run(tmp_path):
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    records = []
    for i in range(8):
        p = imdir / f"{i}.png"
        Image.new("RGB", (16, 16), (i * 30 % 255, 10, 10)).save(p)
        records.append({"path": str(p), "prompt": f"sample {i}"})
    jsonl = tmp_path / "t2i.jsonl"
    with open(jsonl, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(f"""
experiment:
  project: test
  name: tiny
  output_dir: "{tmp_path}/out"
  save_every: 2
  log_every: 1
  resume_from_checkpoint: 'latest'
model:
  vae_model:
    type: wan21
    pretrained_model_path: none
  showo:
    pretrained_model_path: random
    llm_model_path: none
    llm_vocab_size: 200
    hidden_size: 64
    llm_intermediate_size: 128
    llm_num_layers: 2
    llm_num_heads: 4
    llm_num_kv_heads: 2
    llm_head_dim: 16
    image_latent_dim: 16
    image_latent_height: 8
    image_latent_width: 8
    patch_size: 2
    clip_latent_dim: 48
    num_diffusion_layers: 2
    add_time_embeds: true
dataset:
  params:
    t2i_jsonl: "{jsonl}"
  preprocessing:
    resolution: 16
    max_seq_length: 40
    num_t2i_image_tokens: 16
    max_text_len: 8
transport:
  snr_type: lognorm
  do_shift: true
training:
  batch_size_t2i: 2
  learning_rate: 1e-4
  max_train_steps: 3
  und_max_t0: 0.9
""")
    return cfg, tmp_path


def _patch_tiny(monkeypatch):
    """Tiny VAE + SigLIP/DiT dims for the CLI's default ctors."""
    import showo_tpu.show_o2.train_stage_one as m
    from showo_tpu.inference_t2i_v2 import build_showo2_config as orig_build
    from showo_tpu.show_o2.dit import DiffusionHeadConfig
    from showo_tpu.show_o2.siglip import SigLipConfig
    from showo_tpu.show_o2.wan_vae import WanVAEConfig

    tiny_vae = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2),
                            num_res_blocks=1, temperal_downsample=(True,))
    monkeypatch.setattr(m, "WanVAEConfig", lambda: tiny_vae)

    def build(config):
        import dataclasses

        cfg = orig_build(config)
        return dataclasses.replace(
            cfg,
            siglip=SigLipConfig(hidden_size=48, intermediate_size=96,
                                num_heads=4, num_layers=2, num_positions=16),
            dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                                    num_heads=4, num_kv_heads=2, head_dim=24,
                                    num_layers=2))

    import showo_tpu.inference_t2i_v2 as inf

    monkeypatch.setattr(inf, "build_showo2_config", build)


def test_stage1_cli_train_and_resume(tiny_run, monkeypatch):
    cfg, tmp_path = tiny_run
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")  # skip tokenizer retries
    _patch_tiny(monkeypatch)
    from showo_tpu.show_o2.train_stage_one import main

    monkeypatch.setattr(sys, "argv", ["x", f"config={cfg}"])
    main()
    outdir = tmp_path / "out"
    assert (outdir / "config.yaml").exists()
    ckpts = sorted(d for d in os.listdir(outdir) if d.startswith("checkpoint"))
    assert ckpts, os.listdir(outdir)
    # loader state was saved next to the checkpoint
    assert any((outdir / c / "loader_state.json").exists() for c in ckpts)

    # second invocation resumes from 'latest' and trains further
    monkeypatch.setattr(sys, "argv", ["x", f"config={cfg}",
                                      "training.max_train_steps=4"])
    main()
