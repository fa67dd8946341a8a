"""CLIPVisionTowerS2 multiscale features (reference models/clip_encoder.py:85-140).

The reference defers the multiscale loop to the external ``s2wrapper``
package (not vendored there either); this golden re-implements that
algorithm with torch ops (F.interpolate bicubic + chessboard split/merge +
area pooling) and checks our fused JAX version matches through a real tiny
tower, isolating the S2 plumbing semantics (tile order, resize kernel,
pooling) against torch's.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from showo_tpu.models.clip_vit import (ClipVitConfig, clip_vit_features,
                                       clip_vit_features_s2,
                                       init_clip_vit_params)

CFG = ClipVitConfig(hidden_size=32, intermediate_size=64, num_heads=4,
                    num_layers=3, image_size=16, patch_size=4)


def _torch_s2(params, pixels_nhwc, scales, split):
    """s2wrapper.forward semantics, torch ops, jax tower as the model."""
    x_in = torch.from_numpy(np.asarray(pixels_nhwc)).permute(0, 3, 1, 2)
    b = x_in.shape[0]
    outs = []
    base = None
    for s in scales:
        n = math.ceil(s / split)
        x = F.interpolate(x_in.float(), size=(s, s), mode="bicubic")
        h = s // n
        # split_chessboard (s2wrapper.utils): tiles stacked on batch dim
        tiles = torch.cat([x[:, :, i * h:(i + 1) * h, j * h:(j + 1) * h]
                           for i in range(n) for j in range(n)], dim=0)
        f = clip_vit_features(CFG, params,
                              jnp.asarray(tiles.permute(0, 2, 3, 1).numpy()))
        f = torch.from_numpy(np.asarray(f))
        p = int(round(math.sqrt(f.shape[1])))
        f = f.reshape(-1, p, p, f.shape[-1]).permute(0, 3, 1, 2)  # bchw
        # merge_chessboard
        merged = torch.cat([
            torch.cat([f[(i * n + j) * b:(i * n + j + 1) * b]
                       for j in range(n)], dim=-1)
            for i in range(n)], dim=-2)
        if base is None:
            base = merged.shape[-1]
        merged = F.interpolate(merged.float(), size=(base, base), mode="area")
        outs.append(merged)
    out = torch.cat(outs, dim=1)  # channel concat
    return out.permute(0, 2, 3, 1).reshape(b, base * base, -1).numpy()


@pytest.fixture(scope="module")
def tower():
    params = init_clip_vit_params(CFG, jax.random.PRNGKey(0))
    pixels = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 3)), np.float32)
    return params, pixels


def test_s2_matches_torch_algorithm(tower):
    params, pixels = tower
    scales = (16, 32, 48)
    got = np.asarray(clip_vit_features_s2(CFG, params, jnp.asarray(pixels),
                                          scales=scales, max_split_size=16))
    want = _torch_s2(params, pixels, scales, split=16)
    assert got.shape == (2, CFG.num_patches, CFG.hidden_size * 3)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_s2_smallest_scale_slice_is_plain_tower(tower):
    """Scale-0 channels equal the single-scale tower on the resized image."""
    params, pixels = tower
    got = clip_vit_features_s2(CFG, params, jnp.asarray(pixels),
                               scales=(16, 32), max_split_size=16)
    from showo_tpu.models.clip_vit import _bicubic_resize
    small = _bicubic_resize(jnp.asarray(pixels), 16, 16)
    plain = clip_vit_features(CFG, params, small)
    np.testing.assert_allclose(np.asarray(got[..., :CFG.hidden_size]),
                               np.asarray(plain), atol=1e-5, rtol=1e-5)


def test_s2_default_scales_shape():
    """Default 1x/2x/3x scales (clip_encoder.py:90 '336,672,1008')."""
    params = init_clip_vit_params(CFG, jax.random.PRNGKey(0))
    pixels = jax.random.normal(jax.random.PRNGKey(2), (1, 48, 48, 3))
    out = clip_vit_features_s2(CFG, params, pixels)
    assert out.shape == (1, CFG.num_patches, CFG.hidden_size * 3)
