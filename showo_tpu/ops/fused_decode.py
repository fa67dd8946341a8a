"""Fused decode-layer attention: qk-LN + partial RoPE + prefix-cache
concat + omni-mask attention in ONE Pallas program.

The round-2 decode ablation (tools/probe_decode_breakdown.py) showed the
cached-MaskGIT step's attention *region* costs ~3x the attention math
itself — the overhead is XLA's layout context around it: the
[B,S,H*D] -> [B,H,S,D] relayouts, per-head LN / rope materializations,
cache concats and the fp32 score+bias materialization.  This kernel
(VERDICT r2 item 1) removes that context: it reads the *win* fused-matmul
output [B, S, 7*D] directly (q/k/v live in the first three D-column
blocks), applies per-head layernorm and partial rotary in-kernel, builds
K/V as [cache_prefix | fresh] value concats, and computes bias-free
masked attention from O(S) span metadata — the only HBM traffic is the
win output read and the [B, S, D] packed attention output write.

Numerics match the dense path bit-for-bit at the op level: LN in fp32
cast to storage dtype, rope in storage dtype, QK/PV matmuls with fp32
accumulation, fp32 softmax (reference parity: models/phi.py:359-367).

Replaces the hot loop of the reference's models/modeling_showo.py:135-181
(the per-step full forward) on TPU; the reference has no counterpart
kernel (its fused path is imported flash-attn, SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(lastpad_ref, prefix_ref,                       # scalar prefetch
            yq_ref, yk_ref, yv_ref, ck_ref, cv_ref,
            qs_ref, qb_ref, ks_ref, kb_ref,
            cos_ref, sin_ref,
            segk_ref, posk_ref, padk_ref, segq_ref, posq_ref,
            o_ref,
            *, num_heads, head_dim, rotary_dim, eps, sm_scale,
            softmax_dtype):
    b = pl.program_id(0)

    pos_q = posq_ref[0, 0]            # [Q] absolute positions of q rows
    seg_q = segq_ref[0, 0]            # [Q]
    pos_k = posk_ref[0, 0]            # [K] (prefix 0..P-1, then q rows)
    seg_k = segk_ref[0, 0]
    pad_k = padk_ref[0, 0]
    last_pad = lastpad_ref[b]
    prefix = prefix_ref[b]

    visible = pos_k[None, :] <= pos_q[:, None]
    visible |= (seg_q[:, None] == seg_k[None, :]) & (seg_q[:, None] > 0)
    visible |= pos_k[None, :] < prefix
    visible &= (pad_k[None, :] == 0) | (pos_q[:, None] <= last_pad)
    bias = jnp.where(visible, 0.0, NEG_INF)            # [Q, K] fp32

    cos = cos_ref[0]                  # [Q, rotary_dim] fresh-row tables
    sin = sin_ref[0]
    qs, qb = qs_ref[0], qb_ref[0]     # [head_dim]
    ks, kb = ks_ref[0], kb_ref[0]

    def ln(x, scale, shift):
        x32 = x.astype(jnp.float32)
        mu = x32.mean(-1, keepdims=True)
        var = x32.var(-1, keepdims=True)
        y = (x32 - mu) * jax.lax.rsqrt(var + eps)
        return (y * scale[None, :] + shift[None, :]).astype(x.dtype)

    def rope(x):
        # partial rotary, GPT-NeoX half-rotation (models/phi.py:163-198)
        rot, rest = x[:, :rotary_dim], x[:, rotary_dim:]
        half = rotary_dim // 2
        x1, x2 = rot[:, :half], rot[:, half:]
        rotated = jnp.concatenate([-x2, x1], axis=1)
        c = cos.astype(x.dtype)
        s = sin.astype(x.dtype)
        return jnp.concatenate([rot * c + rotated * s, rest], axis=1)

    P = ck_ref.shape[1]
    for h in range(num_heads):
        lo = h * head_dim
        q = rope(ln(yq_ref[0, :, lo:lo + head_dim], qs, qb))   # [Q, D]
        kf = rope(ln(yk_ref[0, :, lo:lo + head_dim], ks, kb)
                  ).astype(ck_ref.dtype)                       # [Q, D]
        ck = ck_ref[0, :, lo:lo + head_dim]                    # [P, D]
        cv = cv_ref[0, :, lo:lo + head_dim]
        vf = yv_ref[0, :, lo:lo + head_dim].astype(cv.dtype)
        # Mosaic cannot concat vectors whose lane offsets differ (odd
        # heads load at lane offset 64), so K/V are never concatenated:
        # scores come from two dots joined on the (computed, offset-0)
        # fp32 side, and PV is the sum of two dots over the prob halves.
        s1 = jax.lax.dot_general(q, ck, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(q, kf, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        scores = jnp.concatenate([s1, s2], axis=1) * sm_scale
        scores = (scores + bias).astype(softmax_dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        p1 = probs[:, :P].astype(cv.dtype)
        p2 = probs[:, P:].astype(cv.dtype)
        out = (jax.lax.dot_general(p1, cv, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
               + jax.lax.dot_general(p2, vf, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32))
        o_ref[0, :, lo:lo + head_dim] = out.astype(o_ref.dtype)


def fused_decode_attention(y, ck, cv, q_ln, k_ln, cos, sin,
                           seg, pad, last_pad, prefix, q_positions,
                           *, hidden: int, num_heads: int, rotary_dim: int,
                           eps: float = 1e-5,
                           sm_scale: Optional[float] = None,
                           softmax_dtype=jnp.float32,
                           interpret: bool = False):
    """y: [B, S, YW] with YW a multiple of ``hidden`` and q/k/v occupying
    the first three hidden-column blocks (the ``win`` fused layer output,
    models/phi.py fuse_parallel_mlp).  ck/cv: [B, P, hidden] packed
    pre-roped cache prefix.  cos/sin: [S, rotary_dim] rope tables for the
    fresh rows.  seg/pad: [B, L] span metadata over the LOGICAL sequence
    (L >= P + S); last_pad/prefix: [B]; q_positions: [S] absolute
    positions of the fresh rows.  Returns packed attention out
    [B, S, hidden].
    """
    B, S, YW = y.shape
    P = ck.shape[1]
    assert YW % hidden == 0 and YW >= 3 * hidden
    D = hidden // num_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    K = P + S
    pos_k = jnp.concatenate([jnp.arange(P, dtype=jnp.int32),
                             q_positions.astype(jnp.int32)])
    # gather metadata for kernel k columns / q rows from the logical maps
    Lpad = jnp.pad(seg, ((0, 0), (0, 1)))
    seg_k = jnp.take_along_axis(
        Lpad, jnp.clip(pos_k, 0, seg.shape[1])[None, :].repeat(B, 0), axis=1)
    pad_kk = jnp.take_along_axis(
        jnp.pad(pad, ((0, 0), (0, 1))),
        jnp.clip(pos_k, 0, pad.shape[1])[None, :].repeat(B, 0), axis=1)
    seg_q = jnp.take_along_axis(
        Lpad, jnp.clip(q_positions, 0, seg.shape[1])[None, :].repeat(B, 0),
        axis=1)
    pos_q = jnp.broadcast_to(q_positions.astype(jnp.int32)[None, None, :],
                             (1, 1, S))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, hidden), lambda b, *_: (b, 0, 0)),  # yq
            pl.BlockSpec((1, S, hidden), lambda b, *_: (b, 0, 1)),  # yk
            pl.BlockSpec((1, S, hidden), lambda b, *_: (b, 0, 2)),  # yv
            pl.BlockSpec((1, P, hidden), lambda b, *_: (b, 0, 0)),  # ck
            pl.BlockSpec((1, P, hidden), lambda b, *_: (b, 0, 0)),  # cv
            pl.BlockSpec((1, D), lambda b, *_: (0, 0)),             # q_ln s
            pl.BlockSpec((1, D), lambda b, *_: (0, 0)),             # q_ln b
            pl.BlockSpec((1, D), lambda b, *_: (0, 0)),             # k_ln s
            pl.BlockSpec((1, D), lambda b, *_: (0, 0)),             # k_ln b
            pl.BlockSpec((1, S, rotary_dim), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec((1, S, rotary_dim), lambda b, *_: (0, 0, 0)),
            pl.BlockSpec((1, 1, K), lambda b, *_: (b, 0, 0)),       # seg_k
            pl.BlockSpec((1, 1, K), lambda b, *_: (0, 0, 0)),       # pos_k
            pl.BlockSpec((1, 1, K), lambda b, *_: (b, 0, 0)),       # pad_k
            pl.BlockSpec((1, 1, S), lambda b, *_: (b, 0, 0)),       # seg_q
            pl.BlockSpec((1, 1, S), lambda b, *_: (0, 0, 0)),       # pos_q
        ],
        out_specs=pl.BlockSpec((1, S, hidden), lambda b, *_: (b, 0, 0)),
    )

    kern = functools.partial(
        _kernel, num_heads=num_heads, head_dim=D, rotary_dim=rotary_dim,
        eps=eps, sm_scale=sm_scale, softmax_dtype=softmax_dtype)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, hidden), y.dtype),
        interpret=interpret,
    )(last_pad.astype(jnp.int32), prefix.astype(jnp.int32),
      y, y, y, ck, cv,
      q_ln["scale"][None, :], q_ln["bias"][None, :],
      k_ln["scale"][None, :], k_ln["bias"][None, :],
      cos[None, :, :].astype(jnp.float32),
      sin[None, :, :].astype(jnp.float32),
      seg_k.astype(jnp.int32)[:, None, :],
      pos_k.astype(jnp.int32)[None, None, :],
      pad_kk.astype(jnp.int32)[:, None, :],
      seg_q.astype(jnp.int32)[:, None, :],
      pos_q)
