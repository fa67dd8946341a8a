"""End-to-end pipeline smoke tests (tiny models, fake tokenizer)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.models.magvit import MagvitV2, VQConfig  # noqa: E402
from showo_tpu.models.phi import PhiConfig  # noqa: E402
from showo_tpu.models.showo import ShowoConfig, init_showo_params  # noqa: E402
from showo_tpu.pipelines.mmu import MMUPipeline  # noqa: E402
from showo_tpu.pipelines.t2i import T2IPipeline  # noqa: E402
from showo_tpu.prompting import UniversalPrompting  # noqa: E402

RES = 64  # 64/16 = 4x4 = 16 vq tokens
VQ_TINY = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1), z_channels=4)


def _make():
    tok = FakeTokenizer()
    uni = UniversalPrompting(tok, max_text_len=8, cond_dropout_prob=0.0)
    # vocab: fake tokenizer ids < 1010; codebook 16 (z=4); layout mirrors
    # the reference: [text vocab | special | codebook | mask]
    text_vocab = 1010
    cfg = ShowoConfig(
        vocab_size=text_vocab + 16 + 1, llm_vocab_size=text_vocab,
        num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
        llm=PhiConfig(vocab_size=text_vocab + 17, hidden_size=64,
                      intermediate_size=128, num_layers=2, num_heads=4),
    )
    params = init_showo_params(cfg, jax.random.PRNGKey(0))
    vq = MagvitV2(VQ_TINY)
    # note: VQ_TINY gives 2x downsample; use 8x8 -> wait: enc_ch_mult len 2
    # -> one downsample -> RES/2 grid.  Pick RES=8 to get 4x4=16 tokens.
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]
    return cfg, params, vq_params, uni


def test_t2i_pipeline_generate():
    cfg, params, vq_params, uni = _make()
    pipe = T2IPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni,
                       guidance_scale=1.5, timesteps=3, max_seq_length=8,
                       resolution=8)
    images = pipe.generate(["a cat", "a dog"], jax.random.PRNGKey(0))
    assert images.shape == (2, 8, 8, 3)
    assert np.isfinite(images).all()


def test_t2i_pipeline_inpaint():
    cfg, params, vq_params, uni = _make()
    pipe = T2IPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni,
                       guidance_scale=0.0, timesteps=2, max_seq_length=8,
                       resolution=8 * 16)  # resolution//16 = 8? -> want grid 4
    pipe.resolution = 64  # 64//16 = 4 -> 4x4 grid matches 16 tokens
    img = np.zeros((8, 8, 3), np.float32)
    mask = np.zeros((64, 64), np.float32)
    mask[:32] = 1.0
    images = pipe.inpaint("fill the sky", img, mask, jax.random.PRNGKey(0),
                          batch_size=2)
    assert images.shape == (2, 8, 8, 3)


def test_mmu_pipeline_answer():
    cfg, params, vq_params, uni = _make()
    pipe = MMUPipeline(cfg=cfg, params=params, vq_cfg=VQ_TINY,
                       vq_params=vq_params, uni_prompting=uni,
                       max_new_tokens=5, top_k=3)
    img = np.zeros((8, 8, 3), np.float32)
    toks = pipe.answer(img, "what is this", jax.random.PRNGKey(0))
    assert len(toks) <= 5
    assert all(0 <= t < cfg.vocab_size for t in toks)
