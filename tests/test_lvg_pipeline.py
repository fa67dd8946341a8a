"""Long-video generation pipeline (lvg) smoke + layout tests."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.models.magvit import MagvitV2, VQConfig  # noqa: E402
from showo_tpu.models.phi import PhiConfig  # noqa: E402
from showo_tpu.models.showo import ShowoConfig, init_showo_params  # noqa: E402
from showo_tpu.pipelines.lvg import LVGPipeline  # noqa: E402
from showo_tpu.prompting import UniversalPrompting  # noqa: E402

VQ_TINY = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1), z_channels=4)


def _make():
    tok = FakeTokenizer()
    uni = UniversalPrompting(tok, max_text_len=8, cond_dropout_prob=0.0)
    text_vocab = 1010
    cfg = ShowoConfig(
        vocab_size=text_vocab + 16 + 1, llm_vocab_size=text_vocab,
        num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
        llm=PhiConfig(vocab_size=text_vocab + 17, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4),
    )
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]
    return cfg, params, vq_params, uni


def test_lvg_generate_three_frames():
    cfg, params, vq_params, uni = _make()
    pipe = LVGPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni,
                       guidance_scale=1.5, timesteps=2, context_frames=2)
    video = pipe.generate(["a river", "a fire"], 3, jax.random.PRNGKey(0))
    assert video.shape == (2, 3, 8, 8, 3)
    assert np.isfinite(video).all()
    # frames must differ (fresh sampling noise per frame)
    assert not np.allclose(video[:, 0], video[:, 1])


def test_lvg_first_frame_conditioning():
    cfg, params, vq_params, uni = _make()
    pipe = LVGPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni,
                       guidance_scale=0.0, timesteps=2, context_frames=1)
    first = np.random.RandomState(0).rand(2, 8, 8, 3).astype(np.float32) * 2 - 1
    video = pipe.generate(["pan right"] * 2, 2, jax.random.PRNGKey(1),
                          first_frame_nhwc=first)
    assert video.shape == (2, 2, 8, 8, 3)
    # frame 0 is the VQ reconstruction of the conditioning image, so it is
    # exactly decode(encode(first)) — recompute and compare
    codes = pipe._encode(vq_params, jnp.asarray(first))
    recon = np.asarray(pipe._decode(vq_params, codes))
    np.testing.assert_allclose(video[:, 0], recon, atol=1e-5)


def test_lvg_payload_layout():
    cfg, params, vq_params, uni = _make()
    pipe = LVGPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni)
    ctx = [np.arange(16, dtype=np.int64).reshape(1, 16) % cfg.codebook_size]
    payload = pipe._frame_payload(ctx, 1)
    sp = uni.sptids
    N = cfg.num_vq_tokens
    assert payload.shape == (1, 2 * N + 2)
    assert payload[0, N] == sp["<|eoi|>"]
    assert payload[0, N + 1] == sp["<|soi|>"]
    assert (payload[0, N + 2:] == cfg.mask_token_id).all()
    # wrapped by the prompt builder, the full sequence has 2 soi and 2 eoi
    ids, _ = uni((["x"], payload), "lvg_gen")
    assert (ids == sp["<|soi|>"]).sum() == 2
    assert (ids == sp["<|eoi|>"]).sum() == 2
