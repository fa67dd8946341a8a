"""SigLIP semantic-encoder parity test."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.siglip import (
    SigLipConfig,
    interpolate_pos_encoding,
    siglip_encode,
)
from showo_tpu.utils.torch_import import siglip_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "siglip_tiny.npz")

TINY = SigLipConfig(hidden_size=64, intermediate_size=128, num_heads=4,
                    num_layers=2, num_positions=9)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_siglip.py")
    return np.load(GOLDEN)


def test_encoder_parity(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = jax.tree.map(
        jnp.asarray,
        siglip_params_from_torch(sd, num_layers=2,
                                 pos_embed=np.zeros((9, 64), np.float32)))
    out = siglip_encode(TINY, params, jnp.asarray(golden["x"]))
    np.testing.assert_allclose(np.asarray(out), golden["out"], atol=3e-5,
                               rtol=1e-4)


def test_pos_interp_identity():
    pe = jnp.arange(9 * 4, dtype=jnp.float32).reshape(9, 4)
    out = interpolate_pos_encoding(pe, 3, 3)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(pe), atol=1e-5)
