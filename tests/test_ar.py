"""AR decode parity: KV-cache jax loop vs. cacheless reference, RNG-bridged."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import PhiConfig
from showo_tpu.models.showo import ShowoConfig, showo_mmu_generate
from showo_tpu.utils.torch_import import phi_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ar_tiny.npz")

CFG = ShowoConfig(
    vocab_size=120, llm_vocab_size=100, num_new_special_tokens=3,
    codebook_size=16, num_vq_tokens=9,
    llm=PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, max_position_embeddings=128),
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_ar.py")
    return np.load(GOLDEN)


def test_mmu_generate_token_exact(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    params = {"showo": jax.tree.map(jnp.asarray,
                                    phi_params_from_torch(sd, num_layers=2))}

    bias = jnp.where(jnp.asarray(golden["bias"]) < 0, -1e9, 0.0)
    tokens, valid = showo_mmu_generate(
        CFG, params,
        jnp.asarray(golden["prompt"]),
        jax.random.PRNGKey(0),
        prompt_bias=bias.astype(jnp.float32),
        max_new_tokens=6,
        temperature=0.9,
        top_k=12,
        injected_gumbel=jnp.asarray(golden["gumbel"]),
    )
    np.testing.assert_array_equal(np.asarray(tokens)[0], golden["tokens"])
    assert bool(valid.all())
