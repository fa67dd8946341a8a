"""MaskGIT sampler parity: RNG-bridged token-exact comparison vs. reference."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, showo_t2i_generate
from showo_tpu.utils.torch_import import phi_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "maskgit_tiny.npz")

CFG = ShowoConfig(
    vocab_size=120, llm_vocab_size=100, num_new_special_tokens=3,
    codebook_size=16, num_vq_tokens=9,
    llm=PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, max_position_embeddings=128),
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_maskgit.py")
    return np.load(GOLDEN)


def test_t2i_generate_token_exact(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = {"showo": jax.tree.map(jnp.asarray, phi_params_from_torch(sd, num_layers=2))}

    bias = jnp.asarray(golden["bias"])
    bias = jnp.where(bias < 0, -1e9, 0.0).astype(jnp.float32)

    tokens = showo_t2i_generate(
        CFG, params,
        jnp.asarray(golden["input_ids"]),
        jax.random.PRNGKey(0),
        uncond_input_ids=jnp.asarray(golden["uncond_ids"]),
        attention_bias=bias,
        guidance_scale=1.75,
        temperature=1.1,
        timesteps=4,
        max_seq_length=5,
        injected_noise=(jnp.asarray(golden["g_sample"]),
                        jnp.asarray(golden["g_conf"])),
    )
    np.testing.assert_array_equal(np.asarray(tokens), golden["tokens"])
