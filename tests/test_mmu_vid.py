"""Video MMU pipeline + load_video smoke tests."""

import numpy as np
import jax
import pytest

from showo_tpu.pipelines.mmu_vid import MMUVidPipeline
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.wan_vae import init_wan_vae_params
from showo_tpu.utils.video import load_video
from tests.test_t2i_v2_pipeline import IDS, TINY, VAE_TINY, Tok


def test_load_video_from_dir(tmp_path):
    from PIL import Image

    for i in range(5):
        Image.new("RGB", (20, 20), (i * 40, 0, 0)).save(tmp_path / f"f{i}.png")
    frames = load_video(str(tmp_path), num_frames=3, resolution=16)
    assert frames.shape == (3, 16, 16, 3)


def test_answer_video():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    pipe = MMUVidPipeline(cfg=TINY, params=params, vae_cfg=VAE_TINY,
                          vae_params=vae_params, tokenizer=Tok(),
                          token_ids=IDS, max_new_tokens=4, top_k=4)
    # 5 pixel frames -> VAE (1 temporal downsample) -> 3 latent frames
    frames = np.zeros((5, 16, 16, 3), np.float32)
    toks = pipe.answer_video(frames, "what happens", jax.random.PRNGKey(0))
    assert len(toks) <= 4
