"""Streaming (online-softmax) Pallas omni-attention for long sequences.

The fused kernels in :mod:`showo_tpu.ops.flash_attention` hold one
(batch, head)'s full K/V in VMEM — fine for every shipped config (v1
S<=1153 full-head, v2 S<=5120 with GQA KV of 256 lanes) but a hard cliff
once video work pushes S past ~8k.  This variant is a true flash
attention: K/V are visited in ``block_k`` tiles with running max /
denominator / accumulator scratch carried across the k-grid dimension,
so VMEM usage is O(block_q * block_k + block_q * D) regardless of S
(reference replacement for flash-attn 2 varlen, models/phi.py:400-615,
and FlexAttention, training/omni_attention.py:17-19 — same role as
flash_attention.py but without the S ceiling).

Same O(S) span-metadata mask predicate as flash_attention.py:

  visible(b, i, j) = [ j <= i
                       | (seg[b,i] == seg[b,j] & seg[b,i] > 0)
                       | j < prefix[b] ]
                     & ( !pad[b,j] | i <= last_pad[b] )

Fully-masked (q-block, k-block) tiles skip both matmuls (the block-
sparsity role of FlexAttention's BlockMask): the predicate is recomputed
from the tile's metadata before any compute, and `pl.when` gates the
whole update.  GQA is supported via a kv-head index map.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
NEG_INF = -1e30
_LANES = 128  # running-stat scratch lane width


def _stream_kernel(lastpad_ref, prefix_ref,            # scalar prefetch
                   qT_ref, kT_ref, vT_ref, seg_ref, pad_ref,
                   segq_ref, posq_ref, oT_ref,
                   m_ref, l_ref, acc_ref,              # VMEM scratch
                   *, sm_scale, block_q, block_k, seq_len, num_k_blocks):
    b = pl.program_id(0)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos_q = posq_ref[0, 0]                      # [BQ] absolute q positions
    seg_q = segq_ref[0, 0]                      # [BQ]
    seg_k = seg_ref[0, 0]                       # [BK]
    pad_k = pad_ref[0, 0]                       # [BK]
    last_pad = lastpad_ref[b]
    prefix = prefix_ref[b]

    rows = pos_q[:, None] + jnp.zeros((1, block_k), jnp.int32)
    cols = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)

    visible = cols <= rows
    visible |= (seg_q[:, None] == seg_k[None, :]) & (seg_q[:, None] > 0)
    visible |= cols < prefix
    visible &= (pad_k[None, :] == 0) | (rows <= last_pad)
    visible &= cols < seq_len

    @pl.when(jnp.any(visible))
    def _update():
        qT = qT_ref[:]                          # [D, BQ]
        kT = kT_ref[:]                          # [D, BK]
        # scores[BQ, BK] = qT^T @ kT
        s = jax.lax.dot_general(
            qT, kT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(visible, s, NEG_INF)

        m_prev = m_ref[:]                       # [BQ, LANES] (replicated)
        l_prev = l_ref[:]
        m_curr = jnp.max(s, axis=-1)[:, None]   # [BQ, 1]
        m_next = jnp.maximum(m_prev, m_curr)    # broadcast -> [BQ, LANES]
        p = jnp.exp(s - m_next[:, :1])          # [BQ, BK]
        # rows with no visible column so far still have m_next == NEG_INF
        # exactly: exp(NEG_INF - NEG_INF) = 1 garbage would leak into l/acc
        # for a real row whose ONLY visible columns never arrive (zero-
        # visibility metadata); zero p so such rows keep l == 0 and hit the
        # _finish guard instead of emitting sum(v)/block_k
        p = jnp.where(m_next[:, :1] == NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_next)        # [BQ, LANES]
        l_next = alpha * l_prev + jnp.sum(p, axis=-1)[:, None]
        m_ref[:] = m_next
        l_ref[:] = l_next
        # accT[D, BQ] = vT @ p^T, rescaled by alpha
        vT = vT_ref[:]                          # [D, BK]
        pv = jax.lax.dot_general(
            vT, p.astype(vT.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha[:, 0][None, :] + pv

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        # fully-masked rows have l == 0 (never updated): emit 0 — these are
        # only the internally padded q rows, sliced off by the caller
        l = l_ref[:, 0][None, :]                # [1, BQ]
        oT_ref[:] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
                     ).astype(oT_ref.dtype)


def omni_attention_streaming(q, k, v, seg, pad=None, last_pad=None,
                             prefix=None,
                             sm_scale: Optional[float] = None,
                             block_q: int = DEFAULT_BLOCK_Q,
                             block_k: int = DEFAULT_BLOCK_K,
                             interpret: bool = False,
                             q_positions=None):
    """q: [B, H, Q, D]; k, v: [B, Hkv, S, D] (GQA via Hkv | H);
    seg: [B, S] int32; pad: [B, S]; last_pad, prefix: [B] int32.
    Returns [B, H, Q, D].  Semantics identical to
    :func:`showo_tpu.ops.flash_attention.omni_attention` (including
    ``q_positions`` for the prefix-cached Q != K path) but with no VMEM
    ceiling on S.
    """
    B, H, Q, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    assert H % Hkv == 0
    group = H // Hkv
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if q_positions is None:
        assert Q == S, "q_positions required when Q != S"
        q_positions = jnp.arange(S)

    block_q = min(block_q, ((Q + 127) // 128) * 128)
    Sp = ((S + block_k - 1) // block_k) * block_k
    Qp = ((Q + block_q - 1) // block_q) * block_q
    if Qp != Q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
        q_positions = jnp.pad(q_positions, (0, Qp - Q))
    if Sp != S:
        kvpad = ((0, 0), (0, 0), (0, Sp - S), (0, 0))
        k = jnp.pad(k, kvpad)
        v = jnp.pad(v, kvpad)
        seg = jnp.pad(seg, ((0, 0), (0, Sp - S)))
    if pad is None:
        pad = jnp.zeros((B, Sp), jnp.int32)
    elif pad.shape[1] != Sp:
        pad = jnp.pad(pad, ((0, 0), (0, Sp - pad.shape[1])))
    if last_pad is None:
        last_pad = jnp.full((B,), -1, jnp.int32)
    if prefix is None:
        prefix = jnp.zeros((B,), jnp.int32)

    seg_q = jnp.take_along_axis(
        jnp.pad(seg, ((0, 0), (0, 1))),
        jnp.clip(q_positions, 0, Sp)[None, :].repeat(B, 0), axis=1)
    pos_q = jnp.broadcast_to(q_positions[None, None, :], (1, 1, Qp))

    qT = jnp.swapaxes(q, 2, 3)
    kT = jnp.swapaxes(k, 2, 3)
    vT = jnp.swapaxes(v, 2, 3)

    num_k_blocks = Sp // block_k
    grid = (B, H, Qp // block_q, num_k_blocks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D, block_q),
                         lambda b, h, i, j, *_: (b, h, 0, i)),
            pl.BlockSpec((1, 1, D, block_k),
                         lambda b, h, i, j, *_: (b, h // group, 0, j)),
            pl.BlockSpec((1, 1, D, block_k),
                         lambda b, h, i, j, *_: (b, h // group, 0, j)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, *_: (b, 0, j)),
            pl.BlockSpec((1, 1, block_k), lambda b, h, i, j, *_: (b, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j, *_: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, j, *_: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, D, block_q),
                               lambda b, h, i, j, *_: (b, h, 0, i)),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),   # running max
            pltpu.VMEM((block_q, _LANES), jnp.float32),   # running denom
            pltpu.VMEM((D, block_q), jnp.float32),        # output acc
        ],
    )

    kernel = functools.partial(
        _stream_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        seq_len=S, num_k_blocks=num_k_blocks)

    def kernel_squeeze(lp_r, pf_r, q_r, k_r, v_r, seg_r, pad_r, segq_r,
                       posq_r, o_r, m_r, l_r, acc_r):
        kernel(lp_r, pf_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
               seg_r, pad_r, segq_r, posq_r, o_r.at[0, 0], m_r, l_r, acc_r)

    outT = pl.pallas_call(
        kernel_squeeze,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D, Qp), q.dtype),
        interpret=interpret,
    )(last_pad.astype(jnp.int32), prefix.astype(jnp.int32),
      qT, kT, vT, seg.astype(jnp.int32)[:, None, :],
      pad.astype(jnp.int32)[:, None, :],
      seg_q.astype(jnp.int32)[:, None, :], pos_q.astype(jnp.int32))

    return jnp.swapaxes(outT, 2, 3)[:, :, :Q, :]
