"""Mixed-modality generation loop smoke test."""

import numpy as np
import jax

from showo_tpu.pipelines.mixed_modality import MixedModalityPipeline
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.wan_vae import init_wan_vae_params
from tests.test_t2i_v2_pipeline import IDS, TINY, VAE_TINY, Tok


def test_mixed_modality_rounds():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    pipe = MixedModalityPipeline(
        cfg=TINY, params=params, vae_cfg=VAE_TINY, vae_params=vae_params,
        tokenizer=Tok(), token_ids=IDS, guidance_scale=2.0, num_steps=2,
        max_new_tokens=4, top_k=4)
    rounds, imgs = pipe.generate("tell a story", jax.random.PRNGKey(0),
                                 num_rounds=2)
    assert len(rounds) >= 1
    if imgs.shape[0]:
        assert imgs.shape[1:] == (16, 16, 3)
        assert np.isfinite(imgs).all()
