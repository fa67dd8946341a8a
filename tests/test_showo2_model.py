"""Show-o2 unified model integration tests (tiny config, jax-only)."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.dit import DiffusionHeadConfig
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.qwen2 import Qwen2Config
from showo_tpu.show_o2.showo2 import (
    Showo2Config,
    extract_v,
    init_showo2_params,
    patchify_labels,
    showo2_forward,
    showo2_t2i_velocity,
    unpatchify_v,
)
from showo_tpu.show_o2.siglip import SigLipConfig
from showo_tpu.show_o2.transport import Transport, ode_timegrid, sample_ode_euler

TINY = Showo2Config(
    llm=Qwen2Config(vocab_size=200, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16),
    siglip=SigLipConfig(hidden_size=48, intermediate_size=96, num_heads=4,
                        num_layers=2, num_positions=9),
    dit=DiffusionHeadConfig(hidden_size=96, intermediate_size=192,
                            num_heads=4, num_kv_heads=2, head_dim=24,
                            num_layers=2),
    image_latent_dim=4,
    image_latent_height=6,
    image_latent_width=6,
    patch_size=2,
    clip_latent_dim=48,
)
# 3x3 patches + 1 time token = 10 image tokens
N_IMG = TINY.num_image_tokens
L = 24
B, M = 2, 1


def _setup():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(2, 190, size=(B, L)))
    mp = jnp.asarray([[[4, N_IMG]], [[6, N_IMG]]])  # [B, 1, 2]
    bias = omni_attn_mask(mp, L)
    latents = jnp.asarray(rng.normal(size=(B * M, 4, 6, 6)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B * M,)), jnp.float32)
    return params, text, mp, bias, latents, t


def test_patchify_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 4, 6, 6)), jnp.float32)
    p = patchify_labels(TINY, x)
    assert p.shape == (3, 9, 16)
    back = unpatchify_v(TINY, p, 3, 3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_training_losses_finite():
    params, text, mp, bias, latents, t = _setup()
    labels = jnp.where(text > 100, text, -100)
    img_mask = np.zeros((B, L), np.int64)
    img_mask[0, 4:4 + N_IMG] = 1
    img_mask[1, 6:6 + N_IMG] = 1
    out = showo2_forward(TINY, params, text, latents, t, bias, mp,
                         text_labels=labels, image_labels=latents,
                         image_masks=jnp.asarray(img_mask))
    assert np.isfinite(float(out["loss_ntp"]))
    assert np.isfinite(float(out["loss_flow"]))
    assert out["logits"].shape == (B, L, 200)


def test_zero_init_head_gives_zero_v():
    """FinalLayer is zero-init, so v must be exactly 0 at init."""
    params, text, mp, bias, latents, t = _setup()
    v = showo2_t2i_velocity(TINY, params, text, latents, t, bias, mp)
    assert v.shape == (B * M, 4, 6, 6)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


def test_cfg_velocity_and_euler_loop():
    params, text, mp, bias, latents, t = _setup()
    # doubled batch for CFG
    text2 = jnp.concatenate([text, text], axis=0)
    mp2 = jnp.concatenate([mp, mp], axis=0)
    bias2 = omni_attn_mask(mp2, L)

    def drift(x, tvec):
        return showo2_t2i_velocity(TINY, params, text2, x, tvec, bias2, mp2,
                                   guidance_scale=2.0)

    z = jax.random.normal(jax.random.PRNGKey(1), (2 * B * M, 4, 6, 6))
    grid = ode_timegrid(5, time_shifting_factor=3.0)
    out = sample_ode_euler(drift, z, grid)
    assert out.shape == z.shape
    assert np.isfinite(np.asarray(out)).all()


def test_extract_v_layout():
    params, text, mp, bias, latents, t = _setup()
    rng = np.random.default_rng(3)
    v_seq = jnp.asarray(rng.normal(size=(B, L, 16)), jnp.float32)
    v = extract_v(TINY, v_seq, mp, 3, 3)
    # span of row 0 starts at 4; time slot dropped
    want = unpatchify_v(TINY, v_seq[0:1, 5:5 + 9], 3, 3)
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(want[0]), atol=1e-6)
