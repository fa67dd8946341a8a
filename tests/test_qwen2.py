"""Qwen2 backbone parity + KV cache tests."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.show_o2.qwen2 import (
    Qwen2Config,
    Qwen2KVCache,
    init_qwen2_params,
    qwen2_forward,
)
from showo_tpu.ops.masks import to_additive
from showo_tpu.utils.torch_import import qwen2_params_from_torch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "qwen2_tiny.npz")

TINY = Qwen2Config(vocab_size=160, hidden_size=64, intermediate_size=128,
                   num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                   rope_theta=1e6, tie_word_embeddings=True)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("run tools/make_golden_qwen2.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def params(golden):
    sd = {k[3:]: golden[k] for k in golden.files if k.startswith("w::")}
    return jax.tree.map(jnp.asarray,
                        qwen2_params_from_torch(sd, num_layers=2))


def test_logits_and_hidden_parity(golden, params):
    ids = jnp.asarray(golden["ids"])
    bias = to_additive(jnp.asarray(golden["mask"]))
    logits, hidden, _ = qwen2_forward(TINY, params, input_ids=ids,
                                      attention_bias=bias)
    np.testing.assert_allclose(np.asarray(hidden), golden["last_hidden"],
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(logits), golden["logits"],
                               atol=3e-5, rtol=1e-4)


def test_kv_cache_decode(golden, params):
    ids = jnp.asarray(golden["ids"])
    B, S = ids.shape
    cap = S + 2
    causal = jnp.tril(jnp.ones((cap, cap), bool))
    full_ids = jnp.concatenate(
        [ids, jnp.asarray([[1, 2], [3, 4]])], axis=1)

    logits_full, _, _ = qwen2_forward(
        TINY, params, input_ids=full_ids,
        attention_bias=to_additive(causal[None, None]))

    cache = Qwen2KVCache.zeros(TINY, B, cap)
    lp, _, cache = qwen2_forward(TINY, params, input_ids=ids,
                                 attention_bias=to_additive(causal[None, None, :S, :]),
                                 cache=cache)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(logits_full[:, :S]),
                               atol=2e-5, rtol=1e-4)
    for t in range(2):
        pos = S + t
        bias = to_additive(causal[None, None, pos:pos + 1, :])
        lt, _, cache = qwen2_forward(TINY, params,
                                     input_ids=full_ids[:, pos:pos + 1],
                                     attention_bias=bias, cache=cache)
        np.testing.assert_allclose(np.asarray(lt[:, 0]),
                                   np.asarray(logits_full[:, pos]),
                                   atol=2e-5, rtol=1e-4)


def test_init_forward():
    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=8)
    params = init_qwen2_params(cfg, jax.random.PRNGKey(0))
    logits, h, _ = qwen2_forward(cfg, params,
                                 input_ids=jnp.zeros((1, 8), jnp.int32))
    assert logits.shape == (1, 8, 64) and h.shape == (1, 8, 32)


def test_fused_inference_weights_match(golden, params):
    """fuse_qkv + fuse_gate_up are numerically identical transforms
    (the Qwen2 analog of models/phi.py:184-232, VERDICT r2 item 2)."""
    from showo_tpu.show_o2.qwen2 import fuse_inference

    ids = jnp.asarray(golden["ids"])
    bias = to_additive(jnp.asarray(golden["mask"]))
    logits, hidden, _ = qwen2_forward(TINY, params, input_ids=ids,
                                      attention_bias=bias)
    fused = fuse_inference(params)
    assert "qkv" in fused["layers"] and "gu" in fused["layers"]
    assert "q" not in fused["layers"] and "gate" not in fused["layers"]
    logits_f, hidden_f, _ = qwen2_forward(TINY, fused, input_ids=ids,
                                          attention_bias=bias)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hidden_f), np.asarray(hidden),
                               rtol=2e-5, atol=2e-5)
    # idempotent
    assert fuse_inference(fused) is not None


def test_fused_kv_cache_decode(golden, params):
    """Fused weights + KV-cache decode == unfused full forward."""
    from showo_tpu.show_o2.qwen2 import fuse_inference

    ids = jnp.asarray(golden["ids"])
    B, S = ids.shape
    bias = to_additive(jnp.asarray(golden["mask"]))
    logits, _, _ = qwen2_forward(TINY, params, input_ids=ids,
                                 attention_bias=bias)
    fused = fuse_inference(params)
    cache = Qwen2KVCache.zeros(TINY, B, S)
    pre_bias = jnp.where(jnp.arange(S)[None, None, None, :] < S - 1,
                         bias[:, :, :S - 1, :], -1e9)
    _, _, cache = qwen2_forward(TINY, fused, input_ids=ids[:, :S - 1],
                                attention_bias=pre_bias, cache=cache)
    step_bias = bias[:, :, S - 1:, :]
    lg, _, _ = qwen2_forward(TINY, fused, input_ids=ids[:, S - 1:],
                             attention_bias=step_bias, cache=cache)
    np.testing.assert_allclose(np.asarray(lg[:, 0]),
                               np.asarray(logits[:, -1]),
                               rtol=2e-4, atol=2e-4)
