"""Phi transformer parity + KV-cache equivalence tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.models.phi import KVCache, PhiConfig, init_phi_params, phi_forward
from showo_tpu.ops.masks import to_additive
from showo_tpu.utils.torch_import import phi_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "phi_tiny.npz")

TINY = PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                 num_layers=2, num_heads=4, max_position_embeddings=128)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures missing; run tools/make_golden_phi.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    return phi_params_from_torch(sd, num_layers=TINY.num_layers)


def test_logits_parity(golden, params):
    ids = jnp.asarray(golden["ids"])
    bias = to_additive(jnp.asarray(golden["mask"]))
    logits, _ = phi_forward(TINY, params, input_ids=ids, attention_bias=bias)
    np.testing.assert_allclose(np.asarray(logits), golden["logits"],
                               atol=2e-5, rtol=1e-4)


def test_kv_cache_matches_full_forward(golden, params):
    """Prefill + step-decode with cache == full re-forward (causal mask)."""
    ids = jnp.asarray(golden["ids"])
    B, S = ids.shape
    S_max = S + 4

    causal = jnp.tril(jnp.ones((S_max, S_max), bool))

    # full forward over S+2 tokens, no cache
    rng = jax.random.PRNGKey(0)
    extra = jax.random.randint(rng, (B, 4), 0, TINY.vocab_size)
    full_ids = jnp.concatenate([ids, extra], axis=1)
    bias_full = to_additive(causal[None, None])
    logits_full, _ = phi_forward(TINY, params, input_ids=full_ids,
                                 attention_bias=bias_full)

    # prefill S, then decode 4 steps with cache
    cache = KVCache.zeros(TINY, B, S_max)
    prefill_bias = to_additive(causal[None, None, :S, :])
    logits_p, cache = phi_forward(TINY, params, input_ids=ids,
                                  attention_bias=prefill_bias, cache=cache)
    np.testing.assert_allclose(np.asarray(logits_p),
                               np.asarray(logits_full[:, :S]), atol=2e-5,
                               rtol=1e-4)

    for t in range(4):
        pos = S + t
        step_bias = to_additive(causal[None, None, pos:pos + 1, :])
        logits_t, cache = phi_forward(
            TINY, params, input_ids=full_ids[:, pos:pos + 1],
            attention_bias=step_bias, cache=cache)
        np.testing.assert_allclose(
            np.asarray(logits_t[:, 0]), np.asarray(logits_full[:, pos]),
            atol=2e-5, rtol=1e-4, err_msg=f"step {t}")


def test_remat_matches(golden, params):
    ids = jnp.asarray(golden["ids"])
    bias = to_additive(jnp.asarray(golden["mask"]))
    a, _ = phi_forward(TINY, params, input_ids=ids, attention_bias=bias)
    b, _ = phi_forward(TINY, params, input_ids=ids, attention_bias=bias,
                       remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_init_and_forward_shapes():
    cfg = PhiConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=2)
    params = init_phi_params(cfg, jax.random.PRNGKey(0))
    ids = jnp.zeros((1, 8), jnp.int32)
    logits, _ = phi_forward(cfg, params, input_ids=ids)
    assert logits.shape == (1, 8, 64)


def test_fuse_parallel_mlp_equivalence():
    """fuse_parallel_mlp (2 wide matmuls per layer) matches the unfused
    forward to fp32 eps, full and cached."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from showo_tpu.models.phi import (
        KVCache,
        PhiConfig,
        fuse_parallel_mlp,
        init_phi_params,
        phi_forward,
    )

    cfg = PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4)
    params = init_phi_params(cfg, jax.random.PRNGKey(0))
    fused = fuse_parallel_mlp(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 120)
    bias = jnp.zeros((2, 1, 16, 16))
    ref, _ = phi_forward(cfg, params, input_ids=ids, attention_bias=bias)
    got, _ = phi_forward(cfg, fused, input_ids=ids, attention_bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # cached decode parity: prefill 8, decode 8 more
    cache = KVCache.zeros(cfg, 2, 16)
    pb = jnp.zeros((2, 1, 8, 16)).at[:, :, :, 8:].set(-1e9)
    _, c_ref = phi_forward(cfg, params, input_ids=ids[:, :8],
                           attention_bias=pb, cache=cache)
    _, c_f = phi_forward(cfg, fused, input_ids=ids[:, :8],
                         attention_bias=pb, cache=cache)
    step_bias = jnp.zeros((2, 1, 8, 16))
    lr, _ = phi_forward(cfg, params, input_ids=ids[:, 8:],
                        attention_bias=step_bias, cache=c_ref)
    lf, _ = phi_forward(cfg, fused, input_ids=ids[:, 8:],
                        attention_bias=step_bias, cache=c_f)
    np.testing.assert_allclose(np.asarray(lf), np.asarray(lr), atol=2e-5)
