"""Wan2.1 3D causal VAE parity: full-clip jax vs streaming reference."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.wan_vae import (
    WanVAEConfig,
    wan_decode_raw,
    wan_encode_raw,
    _to_cfirst,
    _to_tlast,
)
from showo_tpu.utils.torch_import import wan_vae_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "wanvae_tiny.npz")

TINY = WanVAEConfig(dim=16, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                    temperal_downsample=(True,))


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_wanvae.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    return jax.tree.map(jnp.asarray, wan_vae_params_from_torch(sd, TINY))


def _encode(params, x_ncthw):
    mu, logvar = wan_encode_raw(TINY, params, _to_tlast(jnp.asarray(x_ncthw)))
    return _to_cfirst(mu), _to_cfirst(logvar)


def test_encode_image_parity(golden, params):
    mu, logvar = _encode(params, golden["image"])
    np.testing.assert_allclose(np.asarray(mu), golden["mu_i"], atol=1e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar), golden["logvar_i"],
                               atol=1e-4, rtol=1e-3)


def test_encode_video_parity(golden, params):
    mu, _ = _encode(params, golden["video"])
    np.testing.assert_allclose(np.asarray(mu), golden["mu_v"], atol=1e-4,
                               rtol=1e-3)


def test_decode_image_parity(golden, params):
    z = _to_tlast(jnp.asarray(golden["mu_i"]))
    out = _to_cfirst(wan_decode_raw(TINY, params, z))
    np.testing.assert_allclose(np.asarray(out), golden["recon_i"], atol=1e-4,
                               rtol=1e-3)


def test_decode_video_parity(golden, params):
    z = _to_tlast(jnp.asarray(golden["mu_v"]))
    out = _to_cfirst(wan_decode_raw(TINY, params, z))
    assert out.shape == golden["recon_v"].shape
    np.testing.assert_allclose(np.asarray(out), golden["recon_v"], atol=1e-4,
                               rtol=1e-3)
