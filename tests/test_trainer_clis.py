"""CLI main() e2e tests for the v1 unified trainer, the CLIP-ViT variant,
and the mixed-modality trainer (reference train.py:78, train_w_clip_vit.py:73,
train_mixed_modality_simple.py:56): tiny configs, a few fused steps,
checkpoint + resume, and the periodic validation hooks."""

import io
import json
import os
import sys
import tarfile

import numpy as np
import pytest

from showo_tpu.models.magvit import VQConfig
from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig

VQ_TINY = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1), z_channels=4)
TEXT_VOCAB = 1010
SHOWO_TINY = ShowoConfig(
    vocab_size=TEXT_VOCAB + 17, llm_vocab_size=TEXT_VOCAB,
    num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
    llm=PhiConfig(vocab_size=TEXT_VOCAB + 17, hidden_size=64,
                  intermediate_size=128, num_layers=2, num_heads=4),
)


def _png_bytes(color):
    from PIL import Image

    img = Image.new("RGB", (16, 16), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _make_tar_shards(tmp_path, name):
    path = tmp_path / f"{name}-{{00000..00001}}.tar"
    for s in range(2):
        p = tmp_path / f"{name}-{s:05d}.tar"
        with tarfile.open(p, "w") as tf:
            for i in range(4):
                key = f"{s}_{i:04d}"
                img = _png_bytes((i * 40, 90, 140))
                for ext, data in (("jpg", img),
                                  ("txt", f"caption {key}".encode())):
                    info = tarfile.TarInfo(f"{key}.{ext}")
                    info.size = len(data)
                    tf.addfile(info, io.BytesIO(data))
    return str(path)


def _make_parquet(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [f"web document number {i} with enough words " * 8
            for i in range(16)]
    pq.write_table(pa.table({"content": rows}), tmp_path / "lm.parquet")
    return str(tmp_path / "lm.parquet")


def _patch_v1_tiny(monkeypatch):
    import jax
    import jax.numpy as jnp

    import showo_tpu.inference_t2i as inf
    from showo_tpu.models.magvit import MagvitV2

    monkeypatch.setattr(inf, "build_showo_config", lambda config: SHOWO_TINY)

    def tiny_vq(config):
        model = MagvitV2(VQ_TINY)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 8, 3)))["params"]
        return VQ_TINY, params

    monkeypatch.setattr(inf, "load_vq", tiny_vq)


@pytest.fixture()
def v1_cfg(tmp_path):
    t2i = _make_tar_shards(tmp_path, "t2i")
    mmu = _make_tar_shards(tmp_path, "mmu")
    lm = _make_parquet(tmp_path)
    prompts = tmp_path / "prompts.txt"
    prompts.write_text("a red square\na blue circle\n")
    cfg = tmp_path / "v1.yaml"
    cfg.write_text(f"""
experiment:
  project: test
  name: v1-tiny
  output_dir: "{tmp_path}/out"
  save_every: 2
  log_every: 1
  generate_every: 2
  resume_from_checkpoint: 'latest'
model:
  showo:
    pretrained_model_path: random
    llm_model_path: none
    vocab_size: 1027
    llm_vocab_size: 1010
    num_new_special_tokens: 0
    codebook_size: 16
    num_vq_tokens: 16
  vq_model:
    vq_model_name: random
dataset:
  gen_type: t2i
  params:
    train_t2i_shards_path_or_url: "{t2i}"
    train_mmu_shards_path_or_url: "{mmu}"
    train_lm_shards_path_or_url: "{lm}"
    resolution: 8
    validation_prompts_file: "{prompts}"
  preprocessing:
    max_seq_length: 8
training:
  batch_size_t2i: 2
  batch_size_lm: 2
  batch_size_mmu: 2
  cond_dropout_prob: 0.1
  max_train_steps: 3
  guidance_scale: 1.5
  generation_timesteps: 2
""")
    return cfg, tmp_path


def test_v1_cli_train_hooks_resume(v1_cfg, monkeypatch):
    cfg, tmp_path = v1_cfg
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    _patch_v1_tiny(monkeypatch)
    from showo_tpu.training.train_showo import main

    monkeypatch.setattr(sys, "argv", ["x", f"config={cfg}"])
    main()
    out = tmp_path / "out"
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
    assert ckpts, os.listdir(out)
    # validation hooks fired: samples from prompts + triptych panels
    assert len(os.listdir(out / "samples")) > 0
    assert len(os.listdir(out / "predictions")) > 0
    # triptych is [orig | recon | predicted] = 3x wide
    from PIL import Image

    p = out / "predictions" / sorted(os.listdir(out / "predictions"))[0]
    im = Image.open(p)
    assert im.size == (24, 8)

    # resume: second invocation continues past step 3
    monkeypatch.setattr(sys, "argv",
                        ["x", f"config={cfg}", "training.max_train_steps=5"])
    main()
    ckpts2 = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
    assert any(int(c.split("-")[1]) > 3 for c in ckpts2), ckpts2


@pytest.fixture()
def clip_cfg(tmp_path):
    t2i = _make_tar_shards(tmp_path, "t2i")
    lm = _make_parquet(tmp_path)
    # llava conversations + images
    imdir = tmp_path / "llava_imgs"
    imdir.mkdir()
    records = []
    for i in range(6):
        name = f"{i}.png"
        from PIL import Image

        Image.new("RGB", (32, 32), (i * 35 % 255, 60, 20)).save(imdir / name)
        records.append({
            "image": name,
            "conversations": [
                {"from": "human", "value": "<image>\nWhat is shown?"},
                {"from": "gpt", "value": f"A colored square number {i}."},
            ],
        })
    llava = tmp_path / "llava.json"
    llava.write_text(json.dumps(records))
    cfg = tmp_path / "clip.yaml"
    cfg.write_text(f"""
experiment:
  project: test
  name: clip-tiny
  output_dir: "{tmp_path}/out_clip"
  save_every: 2
  log_every: 1
  resume_from_checkpoint: 'latest'
model:
  showo:
    pretrained_model_path: random
    llm_model_path: none
    vocab_size: 1027
    llm_vocab_size: 1010
    num_new_special_tokens: 0
    codebook_size: 16
    num_vq_tokens: 16
    w_clip_vit: true
  vq_model:
    vq_model_name: random
dataset:
  gen_type: t2i
  und_type: llava_tuning
  params:
    train_t2i_shards_path_or_url: "{t2i}"
    train_mmu_shards_path_or_url: "{llava}"
    mmu_image_root: "{imdir}"
    train_lm_shards_path_or_url: "{lm}"
    resolution: 8
  preprocessing:
    max_seq_length: 8
    max_mmu_text_len: 16
training:
  batch_size_t2i: 2
  batch_size_lm: 2
  batch_size_mmu: 2
  cond_dropout_prob: 0.1
  max_train_steps: 2
  projector_lr_scale: 2.0
""")
    return cfg, tmp_path


def test_clip_cli_train_and_resume(clip_cfg, monkeypatch):
    from showo_tpu.models.clip_vit import ClipVitConfig

    cfg, tmp_path = clip_cfg
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    _patch_v1_tiny(monkeypatch)
    import showo_tpu.models.clip_vit as cv

    tiny_clip = ClipVitConfig(hidden_size=32, intermediate_size=64,
                              num_heads=4, num_layers=2, image_size=32,
                              patch_size=16)
    monkeypatch.setattr(cv, "ClipVitConfig", lambda: tiny_clip)
    from showo_tpu.training.train_showo_clip import main

    monkeypatch.setattr(sys, "argv", ["x", f"config={cfg}"])
    main()
    out = tmp_path / "out_clip"
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
    assert ckpts, os.listdir(out)

    # resume continues
    monkeypatch.setattr(sys, "argv",
                        ["x", f"config={cfg}", "training.max_train_steps=4"])
    main()
    ckpts2 = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
    assert any(int(c.split("-")[1]) > 2 for c in ckpts2), ckpts2


@pytest.fixture()
def vist_cfg(tmp_path):
    from PIL import Image

    imdir = tmp_path / "vist_imgs"
    imdir.mkdir()
    records = []
    for i in range(4):
        imgs = []
        for j in range(2):
            name = f"{i}_{j}.png"
            Image.new("RGB", (16, 16), (i * 40, j * 90, 120)).save(
                imdir / name)
            imgs.append(name)
        records.append({"images": imgs,
                        "sentences": [f"story {i} part one",
                                      f"story {i} part two"]})
    vist = tmp_path / "vist.json"
    vist.write_text(json.dumps(records))
    cfg = tmp_path / "mm.yaml"
    cfg.write_text(f"""
experiment:
  project: test
  name: mm-tiny
  output_dir: "{tmp_path}/out_mm"
  save_every: 2
  log_every: 1
  resume_from_checkpoint: 'latest'
model:
  frozen_params: ['image_embedder_und', 'und_trans', 'showo', 'position_embedding']
  vae_model:
    type: wan21
    pretrained_model_path: none
  showo:
    pretrained_model_path: random
    llm_model_path: none
    llm_vocab_size: 1010
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
    mixed_modal_json: "{vist}"
    mixed_modal_image_root: "{imdir}"
  preprocessing:
    resolution: 16
    max_seq_length: 40
    max_mixed_modal_seq_length: 96
    num_t2i_image_tokens: 16
    max_num_images: 2
    max_text_len: 8
transport:
  snr_type: lognorm
  do_shift: true
training:
  batch_size_mixed_modal: 2
  learning_rate: 1e-4
  max_train_steps: 2
  ntp_coeff: 1.0
  flow_coeff: 1.0
""")
    return cfg, tmp_path


def _patch_v2_tiny(monkeypatch, module):
    """Tiny VAE + SigLIP/DiT dims (same pattern as test_stage1_cli.py)."""
    import dataclasses

    from showo_tpu.inference_t2i_v2 import build_showo2_config as orig_build
    from showo_tpu.show_o2.dit import DiffusionHeadConfig
    from showo_tpu.show_o2.siglip import SigLipConfig
    from showo_tpu.show_o2.wan_vae import WanVAEConfig

    tiny_vae = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2),
                            num_res_blocks=1, temperal_downsample=(True,))
    monkeypatch.setattr(module, "WanVAEConfig", lambda: tiny_vae)

    def build(config):
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


def test_mixed_modality_cli_two_phase(vist_cfg, monkeypatch):
    """Two-phase recipe (show-o2/README.md:293-309): phase 1 freezes the
    und path + LLM, phase 2 resumes with everything trainable."""
    cfg, tmp_path = vist_cfg
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    import showo_tpu.show_o2.train_mixed_modality as m

    _patch_v2_tiny(monkeypatch, m)
    monkeypatch.setattr(sys, "argv", ["x", f"config={cfg}"])
    m.main()
    out = tmp_path / "out_mm"
    ckpts = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
    assert ckpts, os.listdir(out)

    # phase 2: unfreeze all, resume, train further
    monkeypatch.setattr(sys, "argv", [
        "x", f"config={cfg}", "model.frozen_params=[]",
        "training.max_train_steps=4"])
    m.main()
    ckpts2 = sorted(d for d in os.listdir(out) if d.startswith("checkpoint"))
    assert any(int(c.split("-")[1]) > 2 for c in ckpts2), ckpts2


def test_max_size_cycle_zip():
    from showo_tpu.training.train_showo import max_size_cycle_zip

    a = [1, 2, 3, 4]
    b = ["x", "y"]
    zipped = list(max_size_cycle_zip(a, b))
    # b cycles until a (the longest) completes one pass
    assert zipped == [(1, "x"), (2, "y"), (3, "x"), (4, "y")]
