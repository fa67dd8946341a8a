"""Show-o2 T2I pipeline smoke test (tiny model, fake tokenizer)."""

import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.pipelines.t2i_v2 import T2IV2Pipeline  # noqa: E402
from showo_tpu.show_o2.dit import DiffusionHeadConfig  # noqa: E402
from showo_tpu.show_o2.qwen2 import Qwen2Config  # noqa: E402
from showo_tpu.show_o2.showo2 import Showo2Config, init_showo2_params  # noqa: E402
from showo_tpu.show_o2.siglip import SigLipConfig  # noqa: E402
from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params  # noqa: E402

VAE_TINY = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2), num_res_blocks=1,
                        temperal_downsample=(True,))
TINY = Showo2Config(
    llm=Qwen2Config(vocab_size=1100, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16),
    siglip=SigLipConfig(hidden_size=48, intermediate_size=96, num_heads=4,
                        num_layers=2, num_positions=16),
    dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                            num_heads=4, num_kv_heads=2, head_dim=24,
                            num_layers=2),
    image_latent_dim=16,
    image_latent_height=8,
    image_latent_width=8,
    patch_size=2,
    clip_latent_dim=48,
)

IDS = dict(bos_id=1, eos_id=2, boi_id=3, eoi_id=4, pad_id=5, img_pad_id=6)


class Tok:
    def __init__(self):
        self._t = FakeTokenizer()

    def __call__(self, text, add_special_tokens=False):
        return {"input_ids": self._t(text)["input_ids"][0]}


def test_t2i_v2_generate():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    pipe = T2IV2Pipeline(cfg=TINY, params=params, vae_cfg=VAE_TINY,
                         vae_params=vae_params, tokenizer=Tok(),
                         token_ids=IDS, guidance_scale=5.0, num_steps=3,
                         max_text_len=12)
    imgs = pipe.generate(["a cat", "a dog"], jax.random.PRNGKey(0))
    # VAE tiny: latent 8x8 -> pixels 16x16 (one 2x spatial stage... dim_mult
    # len 2 => one spatial downsample, so 8x8 latents decode to 16x16)
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(imgs).all()
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0


def test_span_truncation_is_exact():
    """Dropping the suffix rows (eoi/eos/pads after the image span) must
    not change the velocity: image rows attend only j < img_end."""
    import jax.numpy as jnp

    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.showo2 import showo2_t2i_velocity

    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    n_img = TINY.num_image_tokens
    B, L_full = 2, 64
    img_start = 5
    L_cut = img_start + n_img  # drop everything after the span
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(10, 190, size=(B, L_full)), jnp.int32)
    mp = jnp.tile(jnp.asarray([[[img_start, n_img]]], jnp.int32), (B, 1, 1))
    z = jax.random.normal(jax.random.PRNGKey(1),
                          (B, TINY.image_latent_dim, TINY.image_latent_height,
                           TINY.image_latent_width))
    t = jnp.full((B,), 0.3)

    v_full = showo2_t2i_velocity(TINY, params, text, z, t,
                                 omni_attn_mask(mp, L_full), mp,
                                 guidance_scale=0.0)
    v_cut = showo2_t2i_velocity(TINY, params, text[:, :L_cut], z, t,
                                omni_attn_mask(mp, L_cut), mp,
                                guidance_scale=0.0)
    np.testing.assert_allclose(np.asarray(v_full), np.asarray(v_cut),
                               atol=1e-5, rtol=1e-5)
