"""Ring attention: KV sharded over a mesh axis for >=32k sequences.

:mod:`showo_tpu.ops.streaming_attention` removed the VMEM ceiling on S
(single chip, O(S) HBM for K/V); this module removes the *HBM* ceiling by
sharding the sequence axis over the mesh — each device holds S/P rows of
Q, K and V, and K/V shards rotate around the ring via ``ppermute`` while
every device accumulates its Q-block's attention with online-softmax
stats (Liu et al. 2023, "Ring Attention with Blockwise Transformers";
the collectives ride ICI, so compute overlaps the rotation under XLA's
async scheduling).  SURVEY §5.7's long-video completion: 32k tokens of
video latents no longer need to fit one chip's HBM.

Mask semantics are the same O(S) span predicate as flash/streaming
attention (absolute positions threaded through the rotation):

  visible(b, i, j) = [ j <= i
                       | (seg[b,i] == seg[b,j] & seg[b,i] > 0)
                       | j < prefix[b] ]
                     & ( !pad[b,j] | i <= last_pad[b] )

Two entry points:

* :func:`ring_omni_attention` — the per-shard body; call inside
  ``shard_map`` with q/k/v/seg/pad sharded on S over ``axis_name``.
* :func:`ring_omni_attention_sharded` — convenience wrapper that builds
  the ``shard_map`` over a mesh axis for full [B, H, S, D] inputs.

Reference role: flash-attn varlen / FlexAttention at sequence lengths the
reference never reaches on one GPU (models/phi.py:400-615 ceiling is GPU
HBM; here S scales with the mesh).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _chunk_attn(q, k, v, pos_q, pos_k, seg_q, seg_k, pad_k, last_pad,
                prefix, sm_scale):
    """One (local Q) x (one KV chunk) partial attention.

    q: [B, H, Qc, D]; k, v: [B, Hkv, Kc, D]; returns
    (scores-exp [B, H, Qc, Kc] unnormalized, row max [B, H, Qc],
    row sum [B, H, Qc], weighted values [B, H, Qc, D]) — fp32 stats."""
    B, H, Qc, D = q.shape
    Hkv, Kc = k.shape[1], k.shape[2]
    group = H // Hkv
    kq = jnp.repeat(k, group, axis=1) if group > 1 else k
    vq = jnp.repeat(v, group, axis=1) if group > 1 else v

    s = jnp.einsum("bhqd,bhkd->bhqk", q, kq,
                   preferred_element_type=jnp.float32) * sm_scale

    rows = pos_q[:, None]                       # [Qc, 1]
    cols = pos_k[None, :]                       # [1, Kc]
    visible = cols <= rows                      # causal
    visible = visible | ((seg_q[:, :, None] == seg_k[:, None, :])
                         & (seg_q[:, :, None] > 0))      # [B, Qc, Kc]
    visible = visible | (cols < prefix[:, None, None])
    keep = (pad_k[:, None, :] == 0) | (rows[None] <= last_pad[:, None, None])
    mask = (visible & keep)[:, None]            # [B, 1, Qc, Kc]
    s = jnp.where(mask, s, NEG_INF)

    m = jnp.max(s, axis=-1)                                  # [B, H, Qc]
    # fully-masked rows: keep m finite so exp() underflows to 0 cleanly
    m_safe = jnp.maximum(m, NEG_INF / 2)
    p = jnp.exp(s - m_safe[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vq.astype(jnp.float32))
    return m_safe, l, o


def ring_omni_attention(q, k, v, seg, pad=None, last_pad=None, prefix=None,
                        sm_scale: Optional[float] = None,
                        axis_name: str = "sp"):
    """Per-shard ring attention body (call under shard_map).

    q: [B, H, Qloc, D]; k, v: [B, Hkv, Kloc, D]; seg/pad: [B, Kloc] —
    all sharded on the sequence axis over ``axis_name``; last_pad/prefix:
    [B] replicated.  Returns [B, H, Qloc, D] in q.dtype, numerically
    identical to the unsharded omni attention."""
    B, H, Qloc, D = q.shape
    Kloc = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    if pad is None:
        pad = jnp.zeros((B, Kloc), jnp.int32)
    if last_pad is None:
        last_pad = jnp.full((B,), -1, jnp.int32)
    if prefix is None:
        prefix = jnp.zeros((B,), jnp.int32)

    P_ring = jax.lax.psum(1, axis_name)
    my = jax.lax.axis_index(axis_name)
    pos_q = my * Qloc + jnp.arange(Qloc, dtype=jnp.int32)

    qf = q.astype(jnp.float32)

    def body(carry):
        m, l, acc, kc, vc, segc, padc, src = carry
        pos_k = src * Kloc + jnp.arange(Kloc, dtype=jnp.int32)
        # seg rows for the local Q block are this shard's own seg
        # (Q and K are sharded identically on S)
        mc, lc, oc = _chunk_attn(qf, kc, vc, pos_q, pos_k, seg, segc,
                                 padc, last_pad, prefix, sm_scale)
        m_new = jnp.maximum(m, mc)
        a_old = jnp.exp(m - m_new)
        a_new = jnp.exp(mc - m_new)
        l = l * a_old + lc * a_new
        acc = acc * a_old[..., None] + oc * a_new[..., None]

        # rotate: receive the left neighbor's KV chunk (P-1 useful hops;
        # the last rotation restores the original layout)
        perm = [(i, (i + 1) % P_ring) for i in range(P_ring)]
        kc, vc, segc, padc = jax.lax.ppermute(
            (kc, vc, segc, padc), axis_name, perm)
        src = (src - 1) % P_ring
        return m_new, l, acc, kc, vc, segc, padc, src

    m0 = jnp.full((B, H, Qloc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, Qloc), jnp.float32)
    acc0 = jnp.zeros((B, H, Qloc, D), jnp.float32)
    carry = (m0, l0, acc0, k, v, seg, pad, my)
    # P steps: process own chunk, then each rotated-in chunk
    for _ in range(P_ring):  # static trip count: unrolled at trace time
        carry = body(carry)
    m, l, acc = carry[0], carry[1], carry[2]

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


def ring_omni_attention_sharded(mesh: Mesh, q, k, v, seg, pad=None,
                                last_pad=None, prefix=None,
                                sm_scale: Optional[float] = None,
                                axis_name: str = "sp"):
    """Full-array convenience wrapper: shards S over ``mesh[axis_name]``
    and runs the ring.  q: [B, H, S, D]; k, v: [B, Hkv, S, D];
    seg/pad: [B, S]; last_pad/prefix: [B]."""
    B, H, S, D = q.shape
    n = mesh.shape[axis_name]
    assert S % n == 0, f"S={S} must divide over {axis_name}={n}"
    if pad is None:
        pad = jnp.zeros((B, S), jnp.int32)
    if last_pad is None:
        last_pad = jnp.full((B,), -1, jnp.int32)
    if prefix is None:
        prefix = jnp.zeros((B,), jnp.int32)

    fn = jax.shard_map(
        partial(ring_omni_attention, sm_scale=sm_scale,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None),
                  P(None, None, axis_name, None),
                  P(None, None, axis_name, None),
                  P(None, axis_name), P(None, axis_name),
                  P(None), P(None)),
        out_specs=P(None, None, axis_name, None),
        check_vma=False)
    return fn(q, k, v, seg, pad, last_pad, prefix)
