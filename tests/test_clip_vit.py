"""CLIP ViT tower parity vs HF reference fixtures."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.clip_vit import (
    ClipVitConfig,
    clip_vit_features,
    init_clip_vit_params,
)
from showo_tpu.utils.torch_import import clip_vit_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "clip_tiny.npz")

TINY = ClipVitConfig(hidden_size=64, intermediate_size=128, num_heads=4,
                     num_layers=3, image_size=32, patch_size=16)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_clip.py")
    return np.load(GOLDEN)


def test_feature_parity(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = jax.tree.map(jnp.asarray,
                          clip_vit_params_from_torch(sd, num_layers=3))
    x = jnp.asarray(golden["x"]).transpose(0, 2, 3, 1)
    feats = clip_vit_features(TINY, params, x)
    np.testing.assert_allclose(np.asarray(feats), golden["feats"], atol=3e-5,
                               rtol=1e-4)


def test_init_shapes():
    cfg = ClipVitConfig(hidden_size=32, intermediate_size=64, num_heads=4,
                        num_layers=2, image_size=32, patch_size=16)
    params = init_clip_vit_params(cfg, jax.random.PRNGKey(0))
    feats = clip_vit_features(cfg, params, jnp.zeros((1, 32, 32, 3)))
    assert feats.shape == (1, 4, 32)
