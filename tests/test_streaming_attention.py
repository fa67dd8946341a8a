"""Streaming omni-attention vs the dense-mask reference (interpret mode).

Covers what flash_attention.py's tests cover PLUS the regimes that kernel
cannot reach: multi-block K with running-softmax accumulation, GQA
(Hkv < H), and the prefix-cached Q != K decode layout — the streaming
kernel's raison d'être is S beyond the full-KV-in-VMEM ceiling.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.ops.flash_attention import (
    metadata_mmu,
    metadata_predict_next,
    seg_from_modality_positions,
)
from showo_tpu.ops.masks import omni_mask_mmu, omni_mask_predict_next, to_additive
from showo_tpu.ops.streaming_attention import omni_attention_streaming
from showo_tpu.show_o2.masks import omni_attn_mask

PAD, SOI, EOI = 900, 901, 902


def dense_attention(q, k, v, bias):
    """k/v may have fewer heads than q (GQA): repeat to H."""
    H, Hkv = q.shape[1], k.shape[1]
    if Hkv != H:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _qkv(B, H, S, D, seed=0, Hkv=None):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Hkv or H, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Hkv or H, S, D)), jnp.float32)
    return q, k, v


def test_t2i_mask_parity_multiblock():
    """v1 predict_next mask across 4 k-blocks (block_k=16, S=62)."""
    rng = np.random.default_rng(0)
    rows = []
    for p in (0, 5):
        text = rng.integers(5, 800, size=20 - p).tolist()
        img = rng.integers(5, 800, size=40).tolist()
        rows.append([PAD] * p + text + [SOI] + img + [EOI])
    seq = jnp.asarray(rows)
    B, S = seq.shape
    q, k, v = _qkv(B, 2, S, 8)

    bias = omni_mask_predict_next(seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                                  rm_pad_in_image=True)
    want = dense_attention(q, k, v, bias)
    seg, pad, last_pad, prefix = metadata_predict_next(seq, PAD, SOI, EOI)
    got = omni_attention_streaming(q, k, v, seg, pad, last_pad, prefix,
                                   block_q=16, block_k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_mmu_prefix_parity():
    rng = np.random.default_rng(1)
    rows = []
    for _ in range(2):
        img = rng.integers(5, 800, size=12).tolist()
        text = rng.integers(5, 800, size=10).tolist()
        rows.append([905, SOI] + img + [EOI] + text)
    seq = jnp.asarray(rows)
    B, S = seq.shape
    q, k, v = _qkv(B, 2, S, 8, seed=2)
    want = dense_attention(q, k, v, omni_mask_mmu(seq, eoi_id=EOI))
    got = omni_attention_streaming(q, k, v, *metadata_mmu(seq, EOI),
                                   block_q=8, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_v2_omni_parity_gqa():
    """v2 modality-span mask with grouped KV heads (H=4, Hkv=2)."""
    mp = jnp.asarray([[[3, 5], [12, 5]], [[5, 5], [0, 0]]])
    L = 24
    q, k, v = _qkv(2, 4, L, 8, seed=3, Hkv=2)
    want = dense_attention(q, k, v, omni_attn_mask(mp, L))
    seg = seg_from_modality_positions(mp, L)
    got = omni_attention_streaming(q, k, v, seg, block_q=8, block_k=8,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_prefix_cached_decode_q_ne_k():
    """Q != K via q_positions (prefix-cached MaskGIT decode layout)."""
    rng = np.random.default_rng(4)
    P, Qn = 10, 14
    S = P + Qn
    seq = jnp.asarray([[PAD] * 2
                       + rng.integers(5, 800, size=P - 2).tolist()
                       + [SOI] + rng.integers(5, 800, size=Qn - 2).tolist()
                       + [EOI]])
    q_full, k, v = _qkv(1, 2, S, 8, seed=5)
    bias = omni_mask_predict_next(seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                                  rm_pad_in_image=True)
    want = dense_attention(q_full, k, v, bias)[:, :, P:]
    seg, pad, last_pad, prefix = metadata_predict_next(seq, PAD, SOI, EOI)
    got = omni_attention_streaming(
        q_full[:, :, P:], k, v, seg, pad, last_pad, prefix,
        q_positions=P + jnp.arange(Qn), block_q=8, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_long_sequence_many_blocks():
    """S=1030 (ragged vs both block sizes) — the accumulation path the
    full-KV kernels never exercise; plain causal mask."""
    L = 1030
    seg = jnp.zeros((1, L), jnp.int32)
    q, k, v = _qkv(1, 1, L, 8, seed=6)
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    want = dense_attention(q, k, v, to_additive(causal))
    got = omni_attention_streaming(q, k, v, seg, block_q=256, block_k=256,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_block_skip_equivalence():
    """Blocks that are fully masked must not perturb the accumulator:
    compare a heavily-padded row (many dead blocks) against dense."""
    rng = np.random.default_rng(7)
    p = 30
    text = rng.integers(5, 800, size=4).tolist()
    img = rng.integers(5, 800, size=28).tolist()
    seq = jnp.asarray([[PAD] * p + text + [SOI] + img + [EOI]])
    B, S = seq.shape
    q, k, v = _qkv(B, 2, S, 8, seed=8)
    bias = omni_mask_predict_next(seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                                  rm_pad_in_image=True)
    want = dense_attention(q, k, v, bias)
    seg, pad, last_pad, prefix = metadata_predict_next(seq, PAD, SOI, EOI)
    got = omni_attention_streaming(q, k, v, seg, pad, last_pad, prefix,
                                   block_q=8, block_k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_phi_forward_streaming_routing():
    """phi_forward(attn_meta=("pallas_streaming", ...)) matches dense."""
    from unittest import mock

    from showo_tpu.models.phi import PhiConfig, init_phi_params, phi_forward
    from showo_tpu.ops import flash_attention as fa
    from showo_tpu.ops import streaming_attention as sa

    TINY = PhiConfig(vocab_size=140, hidden_size=64, intermediate_size=128,
                     num_layers=2, num_heads=4)
    P2, S2, E2 = 120, 121, 122
    rng = np.random.default_rng(9)
    rows = []
    for p in (0, 2):
        text = rng.integers(5, 100, size=8 - p).tolist()
        img = rng.integers(5, 100, size=10).tolist()
        rows.append([P2] * p + text + [S2] + img + [E2])
    ids = jnp.asarray(rows)
    params = init_phi_params(TINY, jax.random.PRNGKey(0))
    bias = omni_mask_predict_next(ids, pad_id=P2, soi_id=S2, eoi_id=E2,
                                  rm_pad_in_image=True)
    dense_logits, _ = phi_forward(TINY, params, input_ids=ids,
                                  attention_bias=bias)
    meta = ("pallas_streaming",) + fa.metadata_predict_next(ids, P2, S2, E2)
    orig = sa.omni_attention_streaming

    def interp(*args, **kw):
        kw.update(interpret=True, block_q=8, block_k=8)
        return orig(*args, **kw)

    with mock.patch.object(sa, "omni_attention_streaming", interp):
        got, _ = phi_forward(TINY, params, input_ids=ids, attn_meta=meta)
    valid = np.asarray(ids != P2)
    np.testing.assert_allclose(np.asarray(got)[valid],
                               np.asarray(dense_logits)[valid],
                               atol=2e-4, rtol=1e-3)


def test_qwen2_forward_streaming_routing():
    """qwen2_forward streaming impl matches its dense GQA path."""
    from unittest import mock

    from showo_tpu.show_o2.qwen2 import (Qwen2Config, init_qwen2_params,
                                         qwen2_forward)
    from showo_tpu.ops import streaming_attention as sa

    cfg = Qwen2Config(vocab_size=200, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16)
    params = init_qwen2_params(cfg, jax.random.PRNGKey(0))
    mp = jnp.asarray([[[3, 5]], [[5, 5]]])
    L = 16
    ids = jnp.asarray(np.random.default_rng(10).integers(2, 190, (2, L)))
    bias = omni_attn_mask(mp, L)
    dense_out = qwen2_forward(cfg, params, input_ids=ids,
                              attention_bias=bias)
    seg = seg_from_modality_positions(mp, L)
    meta = ("pallas_streaming", seg, None, None, None)
    orig = sa.omni_attention_streaming

    def interp(*args, **kw):
        kw.update(interpret=True, block_q=8, block_k=8)
        return orig(*args, **kw)

    with mock.patch.object(sa, "omni_attention_streaming", interp):
        got = qwen2_forward(cfg, params, input_ids=ids, attn_meta=meta)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(dense_out[0]),
                               atol=2e-4, rtol=1e-3)


def test_zero_visibility_rows_emit_zero():
    """A real q row whose every column is masked (pad columns with
    rows > last_pad) must emit exactly 0, not sum(v)/block_k — the
    in-kernel p-zeroing keeps l == 0 for rows that never see a visible
    column even inside a partially-visible k block."""
    B, H, S, D = 1, 2, 8, 16
    q, k, v = _qkv(B, H, S, D, seed=7)
    seg = jnp.zeros((B, S), jnp.int32)
    pad = jnp.zeros((B, S), jnp.int32).at[:, :2].set(1)
    last_pad = jnp.full((B,), -1, jnp.int32)   # no row keeps pad visibility
    prefix = jnp.zeros((B,), jnp.int32)
    out = omni_attention_streaming(q, k, v, seg, pad, last_pad, prefix,
                                   block_q=8, block_k=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[:, :, :2, :]), 0.0)
    # non-pad rows are normal softmax(QK)V over the visible suffix
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out[:, :, 2:, :])).max() > 0
