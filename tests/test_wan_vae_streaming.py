"""Streaming (chunked, feat-cache) Wan-VAE parity vs the full-clip path.

The reference streams 1+4k pixel-frame chunks through the encoder and
single latent frames through the decoder with per-conv feat_cache
(wan21_vae.py:516-568, cache mechanics :101-160); our streaming mode
carries fixed-shape cache pytrees through lax.scan.  These tests pin the
scan formulation to the golden-matched full-clip formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from showo_tpu.show_o2.wan_vae import (
    WanVAEConfig,
    init_wan_vae_params,
    wan_decode,
    wan_decode_raw,
    wan_decode_raw_streaming,
    wan_decode_streaming,
    wan_encode,
    wan_encode_raw,
    wan_encode_raw_streaming,
    wan_encode_streaming,
)

# z_dim stays 16: the wan_encode/decode facades bake the 16-channel
# latent mean/std constants
CFG = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2, 2), num_res_blocks=1)


@pytest.fixture(scope="module")
def params():
    return init_wan_vae_params(CFG, jax.random.PRNGKey(0))


@pytest.mark.parametrize("T", [1, 5, 9])
def test_encode_streaming_matches_full_clip(params, T):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, 32, 32, 3))
    mu_f, lv_f = wan_encode_raw(CFG, params, x)
    mu_s, lv_s = wan_encode_raw_streaming(CFG, params, x)
    assert mu_s.shape == mu_f.shape
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_f),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_s), np.asarray(lv_f),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("Tz", [1, 3])
def test_decode_streaming_matches_full_clip(params, Tz):
    z = jax.random.normal(jax.random.PRNGKey(2), (1, Tz, 4, 4, CFG.z_dim))
    x_f = wan_decode_raw(CFG, params, z)
    x_s = wan_decode_raw_streaming(CFG, params, z)
    assert x_s.shape == x_f.shape  # [B, 4(Tz-1)+1, 32, 32, 3]
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_f),
                               rtol=1e-4, atol=1e-4)


def test_facades_match(params):
    """wan_encode/wan_decode streaming facades: same normalization +
    reparameterization RNG path as the full-clip facades."""
    vid = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 9, 32, 32))
    key = jax.random.PRNGKey(4)
    z_f = wan_encode(CFG, params, vid, key)
    z_s = wan_encode_streaming(CFG, params, vid, key)
    np.testing.assert_allclose(np.asarray(z_s), np.asarray(z_f),
                               rtol=1e-4, atol=1e-4)
    x_f = wan_decode(CFG, params, z_f)
    x_s = wan_decode_streaming(CFG, params, z_f)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_f),
                               rtol=1e-4, atol=1e-4)


def test_streaming_single_temporal_downsample():
    """Temporal factor generalizes: 1 downsample -> 2 pixel frames per
    latent frame (the tiny test-VAE family)."""
    cfg = WanVAEConfig(dim=16, z_dim=16, dim_mult=(1, 2, 2, 2),
                       num_res_blocks=1,
                       temperal_downsample=(False, False, True))
    p = init_wan_vae_params(cfg, jax.random.PRNGKey(5))
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 5, 32, 32, 3))
    mu_f, _ = wan_encode_raw(cfg, p, x)
    mu_s, _ = wan_encode_raw_streaming(cfg, p, x)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_f),
                               rtol=1e-4, atol=1e-4)
    z = jax.random.normal(jax.random.PRNGKey(7), (1, 3, 4, 4, cfg.z_dim))
    np.testing.assert_allclose(
        np.asarray(wan_decode_raw_streaming(cfg, p, z)),
        np.asarray(wan_decode_raw(cfg, p, z)), rtol=1e-4, atol=1e-4)


def test_streaming_jits_once_for_any_length(params):
    """The scan body is one compiled program regardless of T: jitting the
    streaming decode at two lengths must not change results (shape
    polymorphism rides the scan trip count only)."""
    dec = jax.jit(lambda p, z: wan_decode_raw_streaming(CFG, p, z))
    for Tz in (2, 4):
        z = jax.random.normal(jax.random.PRNGKey(Tz), (1, Tz, 4, 4, CFG.z_dim))
        out = dec(params, z)
        ref = wan_decode_raw(CFG, params, z)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
