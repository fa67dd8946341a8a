"""Show-o2 MMU pipeline smoke test."""

import os
import sys

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from fake_tokenizer import FakeTokenizer  # noqa: E402

from showo_tpu.pipelines.mmu_v2 import MMUV2Pipeline  # noqa: E402
from tests.test_t2i_v2_pipeline import IDS, TINY, VAE_TINY, Tok  # noqa: E402

from showo_tpu.show_o2.showo2 import init_showo2_params  # noqa: E402
from showo_tpu.show_o2.wan_vae import init_wan_vae_params  # noqa: E402


def test_mmu_v2_answer():
    params = init_showo2_params(TINY, jax.random.PRNGKey(0))
    vae_params = init_wan_vae_params(VAE_TINY, jax.random.PRNGKey(1))
    pipe = MMUV2Pipeline(cfg=TINY, params=params, vae_cfg=VAE_TINY,
                         vae_params=vae_params, tokenizer=Tok(),
                         token_ids=IDS, max_new_tokens=6, top_k=4)
    img = np.zeros((16, 16, 3), np.float32)
    toks = pipe.answer(img, "what is shown here", jax.random.PRNGKey(0))
    assert len(toks) <= 6
    assert all(0 <= t < TINY.llm.vocab_size for t in toks)
