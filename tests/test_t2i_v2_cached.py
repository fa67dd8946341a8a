"""v2 cached-window velocity == full-sequence velocity.

The t2i euler loop's text rows are constant across all steps (they
attend only causally backwards, never into the image span), so
showo2_t2i_prefill captures their K/V once and
showo2_t2i_velocity_cached re-forwards only the span rows.  Must be
numerically identical to showo2_t2i_velocity — including per-row
variable modality offsets (the CFG null prompt's span starts at 2).
"""

from unittest import mock

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.ops import flash_attention as fa
from showo_tpu.show_o2.masks import omni_attn_mask
from showo_tpu.show_o2.showo2 import (
    init_showo2_params,
    showo2_t2i_prefill,
    showo2_t2i_velocity,
    showo2_t2i_velocity_cached,
)
from tests.test_train_stage_one import TINY, N_IMG


def _setup(L=40):
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 2
    # per-row variable offsets: row 0 a "real" prompt, row 1 a null (off 2)
    offs = np.array([9, 2])
    text = rng.integers(10, 190, size=(B, L)).astype(np.int64)
    mp = np.stack([[[offs[0], N_IMG]], [[offs[1], N_IMG]]]).astype(np.int64)
    bias = omni_attn_mask(jnp.asarray(mp).reshape(B, 1, 2), L)
    lat = rng.normal(size=(B, TINY.image_latent_dim,
                           TINY.image_latent_height,
                           TINY.image_latent_width)).astype(np.float32)
    t = np.asarray([0.3, 0.7], np.float32)
    return params, jnp.asarray(text), jnp.asarray(mp), bias, \
        jnp.asarray(lat), jnp.asarray(t), offs


def _fresh_bias(bias, offs, n):
    rows = [bias[b:b + 1, :, offs[b]:offs[b] + n, :]
            for b in range(len(offs))]
    return jnp.concatenate(rows, axis=0)


def test_cached_velocity_matches_full_dense():
    params, text, mp, bias, lat, t, offs = _setup()
    v_full = showo2_t2i_velocity(TINY, params, text, lat, t, bias, mp,
                                 guidance_scale=1.5)

    qwen_kv, dit_kv = showo2_t2i_prefill(TINY, params, text, bias, mp)
    bias_fresh = _fresh_bias(bias, offs, N_IMG)
    v_cached = showo2_t2i_velocity_cached(TINY, params, lat, t, bias_fresh,
                                          mp, qwen_kv, dit_kv,
                                          guidance_scale=1.5)
    np.testing.assert_allclose(np.asarray(v_cached), np.asarray(v_full),
                               atol=2e-5, rtol=2e-5)


def test_cached_velocity_matches_full_packed_interpret():
    """Same equality through the packed Pallas kernel (per-row
    q_positions) in interpret mode."""
    from showo_tpu.ops.flash_attention import seg_from_modality_positions

    params, text, mp, bias, lat, t, offs = _setup()
    B, L = text.shape
    seg = seg_from_modality_positions(mp, L)
    meta = ("pallas_packed", seg, jnp.zeros((B, L), jnp.int32),
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32))

    orig = fa.omni_attention_packed

    def interp(*args, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 8)
        return orig(*args, **kw)

    with mock.patch.object(fa, "omni_attention_packed", interp):
        v_full = showo2_t2i_velocity(TINY, params, text, lat, t, None, mp,
                                     guidance_scale=1.5, attn_meta=meta)
        qwen_kv, dit_kv = showo2_t2i_prefill(TINY, params, text, None, mp,
                                             attn_meta=meta)
        v_cached = showo2_t2i_velocity_cached(
            TINY, params, lat, t, None, mp, qwen_kv, dit_kv,
            guidance_scale=1.5, attn_meta=meta)
    np.testing.assert_allclose(np.asarray(v_cached), np.asarray(v_full),
                               atol=2e-5, rtol=2e-5)
