"""Show-o2 video (T>0) path tests."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.showo2 import (
    extract_v,
    init_showo2_params,
    patchify_labels,
    showo2_forward,
    showo2_t2i_velocity,
    unpatchify_v,
)
from tests.test_showo2_model import TINY

T_FRAMES = 2
PER_FRAME = 9  # 3x3 patches
N_VID = T_FRAMES * PER_FRAME + 1  # + time token
L = 32
B = 1


def test_video_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, T_FRAMES, 6, 6)), jnp.float32)
    p = patchify_labels(TINY, x)
    assert p.shape == (2, T_FRAMES * 9, 16)
    back = unpatchify_v(TINY, p, 3, 3, T=T_FRAMES)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_video_forward_and_velocity():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(2, 190, size=(B, L)))
    mp = jnp.asarray([[[4, N_VID]]])
    bias = omni_attn_mask(mp, L)
    latents = jnp.asarray(rng.normal(size=(B, 4, T_FRAMES, 6, 6)), jnp.float32)
    t = jnp.asarray(rng.uniform(size=(B,)), jnp.float32)

    img_mask = np.zeros((B, L), np.int64)
    img_mask[0, 4:4 + N_VID] = 1
    out = showo2_forward(TINY, params, text, latents, t, bias, mp,
                         image_labels=latents,
                         image_masks=jnp.asarray(img_mask))
    assert np.isfinite(float(out["loss_flow"]))

    v = showo2_t2i_velocity(TINY, params, text, latents, t, bias, mp,
                            num_frames=T_FRAMES, first_frame_as_cond=True)
    assert v.shape == (B, 4, T_FRAMES, 6, 6)
    np.testing.assert_allclose(np.asarray(v[:, :, 0]), 0.0, atol=1e-6)
