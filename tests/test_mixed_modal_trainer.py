"""Interleaved mixed-modality trainer step test."""

import numpy as np
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.formats import format_interleaved_sequence
from showo_tpu.show_o2.showo2 import init_showo2_params
from showo_tpu.show_o2.train_mixed_modality import MixedModalTrainer
from showo_tpu.show_o2.train_stage_one import Stage1Config
from showo_tpu.show_o2.transport import Transport
from showo_tpu.show_o2.wan_vae import init_wan_vae_params
from tests.test_train_stage_one import IDS, TINY, VAE_TINY, N_IMG

L = 64
M = 2


def _interleaved_batch(B=2):
    rng = np.random.default_rng(0)
    toks, labs, mps, ims = [], [], [], []
    for _ in range(B):
        t, l, mp, tm, im = format_interleaved_sequence(
            ["img", "img"],
            [list(rng.integers(10, 190, size=3)),
             list(rng.integers(10, 190, size=3))],
            num_image_tokens=N_IMG, max_seq_len=L, max_num_images=M, **IDS)
        toks.append(t)
        labs.append(l)
        mps.append(mp)
        ims.append(im)
    return {
        "text_tokens": np.stack(toks), "text_labels": np.stack(labs),
        "modality_positions": np.stack(mps), "image_masks": np.stack(ims),
        "images": rng.normal(size=(B, M, 16, 16, 3)).astype(np.float32),
    }


def test_mixed_modal_step():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    trainer = MixedModalTrainer(
        cfg=TINY, vae_cfg=VAE_TINY, sc=Stage1Config(und_max_t0=None),
        params=params, vae_params=vae_params,
        transport=Transport(snr_type="lognorm", do_shift=True, seq_len=N_IMG),
        frozen_substrings=("und_trans",))
    batch = _interleaved_batch()
    m = trainer.train_step(batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss_flow"]))
