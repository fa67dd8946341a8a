"""Pallas omni-attention kernel vs dense-mask reference (interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from showo_tpu.ops.flash_attention import (
    metadata_mmu,
    metadata_predict_next,
    omni_attention,
    seg_from_modality_positions,
)
from showo_tpu.ops.masks import omni_mask_mmu, omni_mask_predict_next, to_additive
from showo_tpu.show_o2.masks import omni_attn_mask

PAD, SOI, EOI = 900, 901, 902


def dense_attention(q, k, v, bias):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(q.shape[-1])
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _qkv(B, H, S, D, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.float32)
    return mk(), mk(), mk()


def test_t2i_mask_parity():
    rng = np.random.default_rng(0)
    rows = []
    for p in (0, 3):
        text = rng.integers(5, 800, size=10 - p).tolist()
        img = rng.integers(5, 800, size=20).tolist()
        rows.append([PAD] * p + text + [SOI] + img + [EOI])
    seq = jnp.asarray(rows)
    B, S = seq.shape
    q, k, v = _qkv(B, 2, S, 8)

    bias = omni_mask_predict_next(seq, pad_id=PAD, soi_id=SOI, eoi_id=EOI,
                                  rm_pad_in_image=True)
    want = dense_attention(q, k, v, bias)

    seg, pad, last_pad, prefix = metadata_predict_next(seq, PAD, SOI, EOI)
    got = omni_attention(q, k, v, seg, pad, last_pad, prefix,
                         block_q=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_mmu_mask_parity():
    rng = np.random.default_rng(1)
    rows = []
    for _ in range(2):
        img = rng.integers(5, 800, size=8).tolist()
        text = rng.integers(5, 800, size=6).tolist()
        rows.append([905, SOI] + img + [EOI] + text)
    seq = jnp.asarray(rows)
    B, S = seq.shape
    q, k, v = _qkv(B, 2, S, 8, seed=2)

    want = dense_attention(q, k, v, omni_mask_mmu(seq, eoi_id=EOI))
    got = omni_attention(q, k, v, *metadata_mmu(seq, EOI), block_q=16,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_v2_omni_parity():
    mp = jnp.asarray([[[3, 5], [12, 5]], [[5, 5], [0, 0]]])
    L = 24
    q, k, v = _qkv(2, 2, L, 8, seed=3)
    want = dense_attention(q, k, v, omni_attn_mask(mp, L))
    seg = seg_from_modality_positions(mp, L)
    got = omni_attention(q, k, v, seg, block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_padding_to_block_multiple():
    """S not a multiple of block_q: kernel pads and slices back."""
    L = 20
    seg = jnp.zeros((1, L), jnp.int32)
    q, k, v = _qkv(1, 1, L, 8, seed=4)
    causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
    want = dense_attention(q, k, v, to_additive(causal))
    got = omni_attention(q, k, v, seg, block_q=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5,
                               rtol=1e-4)


def test_s5120_mixed_modal_parity():
    """S=5120 (max_mixed_modal_seq_length, showo2_1.5b_stage_1_a.yaml:69):
    the kernel's full-K/V-in-VMEM layout must hold at the longest shipped
    sequence.  At S=5120, D=64: K+V bf16 ~1.3 MB + a 128x5120 fp32 score
    tile ~2.6 MB per block — comfortably inside the 16 MB VMEM budget;
    this pins the cliff before video work pushes past it."""
    S, D = 5120, 64
    rng = np.random.default_rng(7)
    # v2 mixed-modal layout: 4 image spans of 730 tokens among text
    mp = jnp.asarray([[[100, 730], [1200, 730], [2400, 730], [3900, 730]]])
    seg = seg_from_modality_positions(mp, S)
    q = jnp.asarray(rng.normal(size=(1, 1, S, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 1, S, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 1, S, D)), jnp.float32)

    bias = omni_attn_mask(mp, S)
    want = dense_attention(q, k, v, bias)
    got = omni_attention(q, k, v, seg, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5,
                               rtol=1e-4)
