"""w_clip_vit fused trainer step test (tiny models)."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.models.clip_vit import ClipVitConfig, init_clip_vit_params
from showo_tpu.models.magvit import MagvitV2, VQConfig
from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, init_showo_params
from showo_tpu.sampling.schedules import cosine_schedule
from showo_tpu.training.train_showo_clip import (
    make_fused_clip_train_step,
    make_projector_lr_optimizer,
)
from showo_tpu.training.train_step import TrainConfig, TrainState

VQ_TINY = VQConfig(ch=32, enc_ch_mult=(1, 2), enc_num_res_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_num_res_blocks=(1, 1), z_channels=4)
CLIP_TINY = ClipVitConfig(hidden_size=32, intermediate_size=64, num_heads=4,
                          num_layers=2, image_size=32, patch_size=16)

TEXT_VOCAB = 1010
CFG = ShowoConfig(
    vocab_size=TEXT_VOCAB + 17, llm_vocab_size=TEXT_VOCAB,
    num_new_special_tokens=0, codebook_size=16, num_vq_tokens=16,
    w_clip_vit=True,
    llm=PhiConfig(vocab_size=TEXT_VOCAB + 17, hidden_size=64,
                  intermediate_size=128, num_layers=2, num_heads=4),
)
SP = {"<|pad|>": 1002, "<|soi|>": 1003, "<|eoi|>": 1004, "<|mmu|>": 1005}


def test_clip_train_step():
    params = init_showo_params(CFG, jax.random.PRNGKey(0))
    # mm_projector must map clip hidden (tiny: 32) -> llm hidden (64)
    params["mm_projector"] = {
        "fc1": {"kernel": jax.random.normal(jax.random.PRNGKey(1), (32, 64)) * 0.02,
                "bias": jnp.zeros((64,))},
        "fc2": {"kernel": jax.random.normal(jax.random.PRNGKey(2), (64, 64)) * 0.02,
                "bias": jnp.zeros((64,))},
    }
    vq = MagvitV2(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(1), jnp.zeros((1, 8, 8, 3)))["params"]
    clip_params = init_clip_vit_params(CLIP_TINY, jax.random.PRNGKey(3))

    tc = TrainConfig(max_seq_length=8)
    opt = make_projector_lr_optimizer(tc, params)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    step = make_fused_clip_train_step(
        CFG, VQ_TINY, CLIP_TINY, tc, opt, SP, 2, 2, 2, cosine_schedule,
        system_prompt_len=4)

    rng = np.random.default_rng(0)
    t2i_pixels = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
    t2i_text = jnp.asarray(rng.integers(2, 900, size=(2, 9)))
    lm_ids = jnp.asarray(rng.integers(2, 900, size=(2, 27)))
    lm_labels = jnp.where(lm_ids > 100, lm_ids, -100)
    clip_pixels = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    # [mmu][sys x4][soi][eoi]question...
    mmu_ids = jnp.asarray(np.concatenate([
        np.full((2, 1), SP["<|mmu|>"]),
        rng.integers(2, 900, size=(2, 4)),
        np.full((2, 1), SP["<|soi|>"]),
        np.full((2, 1), SP["<|eoi|>"]),
        rng.integers(2, 900, size=(2, 6)),
    ], axis=1))
    mmu_labels = jnp.where(mmu_ids > 100, mmu_ids, -100)

    state, metrics = step(state, vq_params, clip_params, t2i_pixels,
                          t2i_text, lm_ids, lm_labels, clip_pixels,
                          mmu_ids, mmu_labels, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1
