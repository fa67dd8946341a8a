"""Parity tests for the Pallas decode-attention kernel (interpret mode).

Measurement note (tools/probe_attn_decode.py on v5e): at the cached
MaskGIT decode shape (B=4, H=32, Q=258, K=388) this kernel is NOT faster
than XLA's dense fp32-softmax path (6.1 vs 5.4 ms/step) — the in-model
attention cost turned out to be fusion/layout context, which the
static-prefix decode path (models/phi.py static_prefix_len) and the fused
parallel-residual layer (fuse_parallel_mlp) remove instead.  The kernel
is kept as the measured alternative and for shapes where bias
materialization dominates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from showo_tpu.ops.decode_attention import decode_attention


def _dense_ref(q, k, v, bias):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(D)
    s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, -1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("per_head_grid", [False, True])
def test_decode_attention_matches_dense(per_head_grid):
    rng = np.random.default_rng(0)
    B, H, Q, K, D = 2, 4, 10, 37, 16
    q = jnp.asarray(rng.normal(size=(B, Q, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    bias = jnp.asarray(
        np.where(rng.random((B, 1, Q, K)) > 0.15, 0.0, -1e9), jnp.float32)
    ref = _dense_ref(q, k, v, bias)
    got = decode_attention(q, k, v, bias, interpret=True,
                           per_head_grid=per_head_grid)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_decode_attention_fully_masked_row_padding():
    """Padded K columns get -1e30 bias; a real but fully-masked row must
    still produce finite output (uniform over all keys after max-shift)."""
    rng = np.random.default_rng(1)
    B, H, Q, K, D = 1, 2, 3, 5, 8
    q = jnp.asarray(rng.normal(size=(B, Q, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.float32)
    bias = jnp.zeros((B, 1, Q, K)).at[:, :, 1, :].set(-1e9)
    out = decode_attention(q, k, v, bias, interpret=True)
    assert np.isfinite(np.asarray(out)).all()


def test_phi_cached_decode_pallas_decode_routing():
    """phi_forward static-prefix decode with attn_meta=("pallas_decode",...)
    matches the dense cached path (the end-to-end bench attn=pallas_decode
    plumbing)."""
    from unittest import mock

    from showo_tpu.models.phi import (KVCache, PhiConfig, init_phi_params,
                                      phi_forward)
    from showo_tpu.ops import decode_attention as da

    cfg = PhiConfig(vocab_size=120, hidden_size=64, intermediate_size=128,
                    num_layers=2, num_heads=4)
    params = init_phi_params(cfg, jax.random.PRNGKey(0))
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 120)
    P = 8
    cache = KVCache.zeros(cfg, 2, 16)
    pb = jnp.zeros((2, 1, P, 16)).at[:, :, :, P:].set(-1e9)
    _, c = phi_forward(cfg, params, input_ids=ids[:, :P],
                       attention_bias=pb, cache=cache)
    step_bias = jnp.zeros((2, 1, 8, 16))
    ref, _ = phi_forward(cfg, params, input_ids=ids[:, P:],
                         attention_bias=step_bias, cache=c,
                         static_prefix_len=P)
    meta = ("pallas_decode", jnp.zeros((2, 16), jnp.int32),
            jnp.zeros((2, 16), jnp.int32), jnp.full((2,), -1, jnp.int32),
            jnp.zeros((2,), jnp.int32))
    orig = da.decode_attention

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(da, "decode_attention", interp):
        got, _ = phi_forward(cfg, params, input_ids=ids[:, P:],
                             attention_bias=step_bias, cache=c,
                             static_prefix_len=P, attn_meta=meta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-4)
