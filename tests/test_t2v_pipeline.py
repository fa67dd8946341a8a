"""T2V / I2V pipeline smoke test."""

import numpy as np
import jax

from showo_tpu.pipelines.t2v import T2VPipeline
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.wan_vae import init_wan_vae_params
from tests.test_t2i_v2_pipeline import IDS, TINY, VAE_TINY, Tok


def test_t2v_generate():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    pipe = T2VPipeline(cfg=TINY, params=params, vae_cfg=VAE_TINY,
                       vae_params=vae_params, tokenizer=Tok(), token_ids=IDS,
                       num_latent_frames=3, guidance_scale=2.0, num_steps=2,
                       max_text_len=10)
    videos = pipe.generate(["a rocket launch"], jax.random.PRNGKey(0))
    # tiny VAE: 1 temporal upsample -> 2*(3-1)+1 = 5 pixel frames, 16x16
    assert videos.shape == (1, 5, 16, 16, 3)
    assert np.isfinite(videos).all()


def test_i2v_generate():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    pipe = T2VPipeline(cfg=TINY, params=params, vae_cfg=VAE_TINY,
                       vae_params=vae_params, tokenizer=Tok(), token_ids=IDS,
                       num_latent_frames=3, guidance_scale=0.0, num_steps=2,
                       max_text_len=10)
    frame = np.zeros((16, 16, 3), np.float32)
    videos = pipe.generate(["animate this"], jax.random.PRNGKey(0),
                           first_frame_nhwc=frame)
    assert videos.shape == (1, 5, 16, 16, 3)
