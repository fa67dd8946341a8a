"""Pallas fused omni-attention for TPU.

The omni mask is per-sample block-heterogeneous (causal for text,
bidirectional inside image spans, pad pruning, mmu prefix visibility), so
flash kernels that assume causal/banded structure don't apply.  Instead of
materializing the [B, 1, S, S] additive bias in HBM (what the dense path
does), this kernel recomputes the mask predicate in-kernel from O(S)
span metadata (SURVEY.md §7.3.4):

  visible(b, i, j) = [ j <= i
                       | (seg[b,i] == seg[b,j] & seg[b,i] > 0)
                       | j < prefix[b] ]
                     & ( !pad[b,j] | i <= last_pad[b] )

which expresses every mask in the framework:
  * v1 ``create_attention_mask_predict_next`` (+rm_pad_in_image):
    seg = image-span ids, pad = pad positions, last_pad = last pad index;
  * v1 mmu: prefix = first_eoi + 1;
  * v2 ``omni_attn_mask``: seg from modality_positions;
  * plain causal: all metadata zero / empty.

Layout: q, k, v [B, H, S, D]; S padded to a multiple of the q block; K/V
for one (b, h) live fully in VMEM (S <= ~4k), scores are computed per
128-row q block with the predicate fused, fp32 softmax, bf16 matmuls.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
NEG_INF = -1e30


def _attn_kernel(lastpad_ref, prefix_ref,  # scalar prefetch (SMEM)
                 qT_ref, kT_ref, vT_ref, seg_ref, pad_ref,
                 segq_ref, posq_ref, oT_ref,
                 *, sm_scale, block_q, seq_len):
    """Transposed layout: qT [D, BQ], kT/vT [D, S], out [D, BQ] — lanes are
    always S or BQ (multiples of 128), satisfying Mosaic tiling for any
    head_dim.  segq/posq carry the q rows' segment ids and absolute
    positions, enabling Q != K (prefix-cached decode)."""
    b = pl.program_id(0)

    qT = qT_ref[:]                    # [D, BQ]
    kT = kT_ref[:]                    # [D, S]
    vT = vT_ref[:]                    # [D, S]

    S = kT.shape[1]
    pos_q = posq_ref[0, 0]            # [BQ] absolute positions of q rows
    rows = pos_q[:, None] + jnp.zeros((1, S), jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, S), 1)

    seg = seg_ref[0, 0]               # [S] int32 (this batch row's block)
    pad = pad_ref[0, 0]               # [S] int32
    seg_q = segq_ref[0, 0]            # [BQ]
    last_pad = lastpad_ref[b]
    prefix = prefix_ref[b]

    visible = cols <= rows
    visible |= (seg_q[:, None] == seg[None, :]) & (seg_q[:, None] > 0)
    visible |= cols < prefix
    visible &= (pad[None, :] == 0) | (rows <= last_pad)
    visible &= cols < seq_len         # kv padding of the 128-multiple

    # scores[BQ, S] = qT^T @ kT  (contract D)
    scores = jax.lax.dot_general(
        qT, kT, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    scores = jnp.where(visible, scores, NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1)
    # outT[D, BQ] = vT @ probs^T  (contract S)
    outT = jax.lax.dot_general(
        vT, probs.astype(vT.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    oT_ref[:] = outT.astype(oT_ref.dtype)


def omni_attention(q, k, v, seg, pad=None, last_pad=None, prefix=None,
                   sm_scale: Optional[float] = None,
                   block_q: int = DEFAULT_BLOCK_Q,
                   interpret: bool = False,
                   q_positions=None):
    """q: [B, H, Q, D]; k, v: [B, H, S, D]; seg: [B, S] int32 (kv segment
    ids); pad: [B, S]; last_pad, prefix: [B] int32.  Returns [B, H, Q, D].

    Q == S by default (self-attention); for the prefix-cached path pass
    ``q_positions`` [Q] — the absolute kv positions of the q rows (their
    segment ids are gathered from ``seg``).  Both Q and S are padded
    internally to block multiples.
    """
    B, H, Q, D = q.shape
    S = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if q_positions is None:
        assert Q == S, "q_positions required when Q != S"
        q_positions = jnp.arange(S)

    Sp = ((S + block_q - 1) // block_q) * block_q
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

    # q rows' segment ids, gathered from the kv segment map
    seg_q = jnp.take_along_axis(
        jnp.pad(seg, ((0, 0), (0, 1))),  # guard for padded positions
        jnp.clip(q_positions, 0, Sp)[None, :].repeat(B, 0), axis=1)
    pos_q = jnp.broadcast_to(q_positions[None, None, :], (1, 1, Qp))

    grid = (B, H, Qp // block_q)

    # transposed [B, H, D, *] layout so the lane axis is S/BQ (x128)
    qT = jnp.swapaxes(q, 2, 3)
    kT = jnp.swapaxes(k, 2, 3)
    vT = jnp.swapaxes(v, 2, 3)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D, block_q), lambda b, h, i, *_: (b, h, 0, i)),
            pl.BlockSpec((1, 1, D, Sp), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, Sp), lambda b, h, i, *_: (b, h, 0, 0)),
            # metadata as [B, 1, Sp]: block dims equal the array dims on the
            # last two axes, so Mosaic tiling accepts them and the batch row
            # is selected by the index map (no dynamic sublane indexing)
            pl.BlockSpec((1, 1, Sp), lambda b, h, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, h, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, h, i, *_: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, D, block_q),
                               lambda b, h, i, *_: (b, h, 0, i)),
    )

    def kernel_squeeze(lp_r, pf_r, q_r, k_r, v_r, seg_r, pad_r, segq_r,
                       posq_r, o_r):
        _attn_kernel(lp_r, pf_r,
                     q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
                     seg_r, pad_r, segq_r, posq_r,
                     o_r.at[0, 0], sm_scale=sm_scale, block_q=block_q,
                     seq_len=S)

    outT = pl.pallas_call(
        kernel_squeeze,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D, Qp), q.dtype),
        interpret=interpret,
    )(last_pad.astype(jnp.int32), prefix.astype(jnp.int32),
      qT, kT, vT, seg.astype(jnp.int32)[:, None, :],
      pad.astype(jnp.int32)[:, None, :],
      seg_q.astype(jnp.int32)[:, None, :],
      pos_q.astype(jnp.int32))

    return jnp.swapaxes(outT, 2, 3)[:, :, :Q, :]


# ---------------------------------------------------------------------------
# Packed-layout variant: q/k/v [B, S, H*D] (the natural projection output
# layout) — no HBM transposes; heads are sliced from loaded VMEM values.
# ---------------------------------------------------------------------------


def _attn_kernel_packed(lastpad_ref, prefix_ref,
                        q_ref, k_ref, v_ref, seg_ref, pad_ref,
                        segq_ref, posq_ref, o_ref,
                        *, sm_scale, block_q, seq_len, num_heads, head_dim,
                        num_kv_heads):
    b = pl.program_id(0)

    q_all = q_ref[:]                  # [BQ, H*D]
    k_all = k_ref[:]                  # [S, H*D]
    v_all = v_ref[:]                  # [S, H*D]
    S = k_all.shape[0]

    pos_q = posq_ref[0, 0]
    rows = pos_q[:, None] + jnp.zeros((1, S), jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, S), 1)
    seg = seg_ref[0, 0]
    pad = pad_ref[0, 0]
    seg_q = segq_ref[0, 0]
    last_pad = lastpad_ref[b]
    prefix = prefix_ref[b]

    visible = cols <= rows
    visible |= (seg_q[:, None] == seg[None, :]) & (seg_q[:, None] > 0)
    visible |= cols < prefix
    visible &= (pad[None, :] == 0) | (rows <= last_pad)
    visible &= cols < seq_len
    bias = jnp.where(visible, 0.0, NEG_INF)

    group = num_heads // num_kv_heads
    for h in range(num_heads):
        lo = h * head_dim
        kv_lo = (h // group) * head_dim
        q = q_all[:, lo:lo + head_dim]
        k = k_all[:, kv_lo:kv_lo + head_dim]
        v = v_all[:, kv_lo:kv_lo + head_dim]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale + bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, lo:lo + head_dim] = out.astype(o_ref.dtype)


def omni_attention_packed(q, k, v, seg, pad=None, last_pad=None, prefix=None,
                          num_heads: int = 32,
                          num_kv_heads: Optional[int] = None,
                          sm_scale: Optional[float] = None,
                          block_q: Optional[int] = None,
                          interpret: bool = False,
                          q_positions=None,
                          gqa_stack: bool = False):
    """q: [B, Q, H*D]; k, v: [B, S, Hkv*D] (GQA supported).  Same
    predicate semantics as :func:`omni_attention` but in the packed
    projection layout (no transposes in HBM).  q_positions may be [Q]
    (shared) or [B, Q] (per-row kv positions — the v2 cached-window
    path where modality offsets vary per batch row)."""
    B, Q, HD = q.shape
    S = k.shape[1]
    D = HD // num_heads
    if num_kv_heads is None:
        num_kv_heads = num_heads
    if block_q is None:
        # measured on v5e (tools/probe_packed_attn_shapes.py, S=986):
        # 256-row q blocks beat 128 by ~13% (DiT and Qwen) — bigger M
        # per dot; 512 regresses (VMEM pressure).  128 when Q is small.
        block_q = 256 if Q >= 256 else DEFAULT_BLOCK_Q
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if q_positions is None:
        assert Q == S
        q_positions = jnp.arange(S)
    q_positions = jnp.broadcast_to(jnp.atleast_2d(q_positions), (B, Q))

    Sp = ((S + block_q - 1) // block_q) * block_q
    Qp = ((Q + block_q - 1) // block_q) * block_q
    if Qp != Q:
        q = jnp.pad(q, ((0, 0), (0, Qp - Q), (0, 0)))
        q_positions = jnp.pad(q_positions, ((0, 0), (0, Qp - Q)))
    if Sp != S:
        k = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0)))
        seg = jnp.pad(seg, ((0, 0), (0, Sp - S)))
    if pad is None:
        pad = jnp.zeros((B, Sp), jnp.int32)
    elif pad.shape[1] != Sp:
        pad = jnp.pad(pad, ((0, 0), (0, Sp - pad.shape[1])))
    if last_pad is None:
        last_pad = jnp.full((B,), -1, jnp.int32)
    if prefix is None:
        prefix = jnp.zeros((B,), jnp.int32)

    # GQA: stack the q-head groups along rows so each kv head costs one
    # wide dot (see _omni_attention_gqa_stacked).  MEASURED NEGATIVE on
    # v5e at the t2i shapes (tools/probe_packed_attn_shapes.py: DiT 5.06
    # vs 3.61 ms, Qwen 2.42 vs 1.88 ms per 10 applications) — the HBM
    # transposes into [B,Hkv,D,G*Qp] layout cost more than the wider
    # dots save.  Kept opt-in as the recorded experiment.
    group = num_heads // num_kv_heads
    if gqa_stack and group > 1 and Sp * block_q * group * 4 <= 8 * 1024 * 1024:
        return _omni_attention_gqa_stacked(
            q, k, v, seg, pad, last_pad, prefix, q_positions,
            num_heads=num_heads, num_kv_heads=num_kv_heads,
            sm_scale=sm_scale, block_q=block_q, S=S,
            interpret=interpret)[:, :Q, :]

    seg_q = jnp.take_along_axis(
        jnp.pad(seg, ((0, 0), (0, 1))),
        jnp.clip(q_positions, 0, Sp), axis=1)
    pos_q = q_positions[:, None, :]                    # [B, 1, Qp]

    grid = (B, Qp // block_q)
    KVD = num_kv_heads * D
    kernel = functools.partial(
        _attn_kernel_packed, sm_scale=sm_scale, block_q=block_q, seq_len=S,
        num_heads=num_heads, head_dim=D, num_kv_heads=num_kv_heads)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, Sp, KVD), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, Sp, KVD), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, *_: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
    )

    def kernel_squeeze(lp_r, pf_r, q_r, k_r, v_r, seg_r, pad_r, segq_r,
                       posq_r, o_r):
        kernel(lp_r, pf_r, q_r.at[0], k_r.at[0], v_r.at[0], seg_r, pad_r,
               segq_r, posq_r, o_r.at[0])

    out = pl.pallas_call(
        kernel_squeeze,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Qp, HD), q.dtype),
        interpret=interpret,
    )(last_pad.astype(jnp.int32), prefix.astype(jnp.int32),
      q, k, v, seg.astype(jnp.int32)[:, None, :],
      pad.astype(jnp.int32)[:, None, :],
      seg_q.astype(jnp.int32)[:, None, :], pos_q.astype(jnp.int32))

    return out[:, :Q, :]


def _omni_attention_gqa_stacked(q, k, v, seg, pad, last_pad, prefix,
                                q_positions, *, num_heads, num_kv_heads,
                                sm_scale, block_q, S, interpret):
    """GQA-stacked packed attention: the `group` q-heads sharing one kv
    head are stacked along the ROW axis outside the kernel (an XLA
    transpose), so the grid is (B, Hkv, row-blocks) and every program
    runs ONE [D, group*block_q] x [D, S] dot pair instead of `group`
    narrow per-head dots — 4x (DiT) / 6x (Qwen decode prefill) fewer
    Mosaic dots at proportionally larger M.  Reuses _attn_kernel (the
    transposed-layout kernel) unchanged.

    MEASURED NEGATIVE (v5e, tools/probe_packed_attn_shapes.py): loses
    ~35%/25% to the per-head packed loop at the DiT/Qwen S=986 shapes —
    the layout transposes dominate.  Opt-in via gqa_stack=True only.

    q [B, Qp, H*D] (padded), k/v [B, Sp, Hkv*D] (padded), q_positions
    [B, Qp]; returns [B, Qp, H*D].
    """
    B, Qp, HD = q.shape
    Sp = k.shape[1]
    D = HD // num_heads
    G = num_heads // num_kv_heads
    bq2 = block_q * G                     # always divides G*Qp

    # [B, Qp, Hkv, G, D] -> [B, Hkv, D, G*Qp]  (row g*Qp+pos)
    qT = q.reshape(B, Qp, num_kv_heads, G, D).transpose(0, 2, 4, 3, 1) \
        .reshape(B, num_kv_heads, D, G * Qp)
    kT = k.reshape(B, Sp, num_kv_heads, D).transpose(0, 2, 3, 1)
    vT = v.reshape(B, Sp, num_kv_heads, D).transpose(0, 2, 3, 1)

    seg_q = jnp.take_along_axis(
        jnp.pad(seg, ((0, 0), (0, 1))),
        jnp.clip(q_positions, 0, Sp), axis=1)           # [B, Qp]
    seg_qt = jnp.tile(seg_q, (1, G))[:, None, :]        # [B, 1, G*Qp]
    pos_qt = jnp.tile(q_positions, (1, G))[:, None, :]

    grid = (B, num_kv_heads, (G * Qp) // bq2)
    kernel = functools.partial(_attn_kernel, sm_scale=sm_scale,
                               block_q=bq2, seq_len=S)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, D, bq2), lambda b, h, i, *_: (b, h, 0, i)),
            pl.BlockSpec((1, 1, D, Sp), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D, Sp), lambda b, h, i, *_: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, h, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, h, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq2), lambda b, h, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 1, bq2), lambda b, h, i, *_: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, D, bq2),
                               lambda b, h, i, *_: (b, h, 0, i)),
    )

    def kernel_squeeze(lp_r, pf_r, q_r, k_r, v_r, seg_r, pad_r, segq_r,
                       posq_r, o_r):
        kernel(lp_r, pf_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
               seg_r, pad_r, segq_r, posq_r, o_r.at[0, 0])

    outT = pl.pallas_call(
        kernel_squeeze,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, num_kv_heads, D, G * Qp),
                                       q.dtype),
        interpret=interpret,
    )(last_pad.astype(jnp.int32), prefix.astype(jnp.int32),
      qT, kT, vT, seg.astype(jnp.int32)[:, None, :],
      pad.astype(jnp.int32)[:, None, :],
      seg_qt.astype(jnp.int32), pos_qt.astype(jnp.int32))

    # [B, Hkv, D, G, Qp] -> [B, Qp, Hkv*G*D]
    return outT.reshape(B, num_kv_heads, D, G, Qp) \
        .transpose(0, 4, 1, 3, 2).reshape(B, Qp, HD)


# ---------------------------------------------------------------------------
# Metadata builders: token sequences -> O(S) kernel metadata
# ---------------------------------------------------------------------------

def seg_from_soi_eoi(sequence, soi_id: int, eoi_id: int):
    """Image-span ids (1-based per row, 0 for text) from soi/eoi markers —
    matches the span semantics of prompting_utils.py:479-481."""
    is_soi = sequence == soi_id
    is_eoi = sequence == eoi_id
    c_soi = jnp.cumsum(is_soi, axis=1)
    c_eoi = jnp.cumsum(is_eoi, axis=1)
    inside = (c_soi > c_eoi) | is_soi | is_eoi
    return jnp.where(inside, c_soi, 0).astype(jnp.int32)


def seg_from_modality_positions(modality_positions, L: int):
    """[B, M, 2] spans -> seg ids [B, L] (v2 omni)."""
    B, M, _ = modality_positions.shape
    pos = jnp.arange(L)[None, :, None]
    off = modality_positions[:, None, :, 0]
    length = modality_positions[:, None, :, 1]
    in_span = (pos >= off) & (pos < off + length)   # [B, L, M]
    sid = jnp.argmax(
        jnp.where(in_span, jnp.arange(M)[None, None, :] + 1, 0), axis=-1)
    return jnp.where(in_span.any(-1), sid + 1, 0).astype(jnp.int32)


def metadata_predict_next(sequence, pad_id: int, soi_id: int, eoi_id: int):
    """Metadata reproducing omni_mask_predict_next(rm_pad_in_image=True)
    for the t2i generation layout (left-padded text + one image span)."""
    seg = seg_from_soi_eoi(sequence, soi_id, eoi_id)
    pad = (sequence == pad_id).astype(jnp.int32)
    L = sequence.shape[1]
    idx = jnp.arange(L)[None, :]
    last_pad = jnp.max(jnp.where(pad > 0, idx, -1), axis=1).astype(jnp.int32)
    prefix = jnp.zeros((sequence.shape[0],), jnp.int32)
    return seg, pad, last_pad, prefix


def metadata_mmu(sequence, eoi_id: int):
    """Metadata reproducing create_attention_mask_for_mmu: causal + full
    visibility of columns up to the batch-first eoi."""
    B, L = sequence.shape
    is_eoi = sequence == eoi_id
    idx = jnp.arange(L)[None, :]
    row_first = jnp.min(jnp.where(is_eoi, idx, L), axis=1)
    has = is_eoi.any(axis=1)
    first_row = jnp.argmax(has)
    eoi_col = row_first[first_row]
    seg = jnp.zeros((B, L), jnp.int32)
    pad = jnp.zeros((B, L), jnp.int32)
    last_pad = jnp.full((B,), -1, jnp.int32)
    prefix = jnp.full((B,), eoi_col + 1, jnp.int32)
    return seg, pad, last_pad, prefix
