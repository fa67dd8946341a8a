"""Trainable streaming omni-attention: custom-VJP flash backward.

Training currently runs attention on the dense XLA path, which stores (or
under `jax.checkpoint` recomputes) fp32 [B, H, S, S] score tensors — at
the v2 mixed-modal/video lengths (S=5120+, showo2_1.5b_stage_1_a.yaml:69)
that is gigabytes per layer and ~2x the Pallas kernel's forward time
(STATUS.md streaming table).  This module adds the missing piece for
training: a `jax.custom_vjp` around :func:`omni_attention_streaming`'s
math with flash-style backward kernels that recompute score blocks in
VMEM instead of ever materializing S x S in HBM (the role flash-attn 2's
backward plays for the reference, models/phi.py:400-615).

Forward: the streaming kernel extended to also emit the per-row
logsumexp.  Backward: two K-blocked kernels —

  dq  : grid (B, H, i, j), accumulates dQ_i over k-blocks j
  dkv : grid (B, H, j, i), accumulates dK_j/dV_j over q-blocks i

with P recomputed from (q, k, lse) per tile and
``dS = P * (dP - rowsum(dO * O))``.  GQA: per-head dk/dv are summed over
the query-head group outside the kernel.  Self-attention only (Q == S).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from showo_tpu.ops.streaming_attention import (
    DEFAULT_BLOCK_K,
    DEFAULT_BLOCK_Q,
    NEG_INF,
    _LANES,
)


def _visible(pos_q, seg_q, seg_k, pad_k, last_pad, prefix, j, block_q,
             block_k, seq_len):
    rows = pos_q[:, None] + jnp.zeros((1, block_k), jnp.int32)
    cols = j * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_k), 1)
    vis = cols <= rows
    vis |= (seg_q[:, None] == seg_k[None, :]) & (seg_q[:, None] > 0)
    vis |= cols < prefix
    vis &= (pad_k[None, :] == 0) | (rows <= last_pad)
    vis &= cols < seq_len
    return vis


def _fwd_kernel(lastpad_ref, prefix_ref,
                qT_ref, kT_ref, vT_ref, seg_ref, pad_ref, segq_ref, posq_ref,
                oT_ref, lse_ref,
                m_ref, l_ref, acc_ref,
                *, sm_scale, block_q, block_k, seq_len, num_k_blocks):
    b = pl.program_id(0)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vis = _visible(posq_ref[0, 0], segq_ref[0, 0], seg_ref[0, 0],
                   pad_ref[0, 0], lastpad_ref[b], prefix_ref[b], j,
                   block_q, block_k, seq_len)

    @pl.when(jnp.any(vis))
    def _update():
        s = jax.lax.dot_general(
            qT_ref[:], kT_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(vis, s, NEG_INF)
        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=-1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp(s - m_next[:, :1])
        alpha = jnp.exp(m_prev - m_next)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=-1)[:, None]
        m_ref[:] = m_next
        pv = jax.lax.dot_general(
            vT_ref[:], p.astype(vT_ref.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[:] = acc_ref[:] * alpha[:, 0][None, :] + pv

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        l = l_ref[:, 0][None, :]
        oT_ref[:] = (acc_ref[:] / jnp.where(l == 0.0, 1.0, l)
                     ).astype(oT_ref.dtype)
        # lse; fully-masked (padded) rows get +inf-like so backward P = 0
        lse = jnp.where(l_ref[:, :1] == 0.0, -NEG_INF,
                        m_ref[:, :1] + jnp.log(jnp.maximum(l_ref[:, :1],
                                                           1e-37)))
        lse_ref[0, 0, 0] = lse[:, 0]


def _dq_kernel(lastpad_ref, prefix_ref,
               qT_ref, kT_ref, vT_ref, doT_ref, lse_ref, delta_ref,
               seg_ref, pad_ref, segq_ref, posq_ref,
               dqT_ref,
               acc_ref,
               *, sm_scale, block_q, block_k, seq_len, num_k_blocks):
    b = pl.program_id(0)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    vis = _visible(posq_ref[0, 0], segq_ref[0, 0], seg_ref[0, 0],
                   pad_ref[0, 0], lastpad_ref[b], prefix_ref[b], j,
                   block_q, block_k, seq_len)

    @pl.when(jnp.any(vis))
    def _update():
        qT, kT = qT_ref[:], kT_ref[:]
        s = jax.lax.dot_general(
            qT, kT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(vis, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0, 0][:, None])            # [BQ, BK]
        dp = jax.lax.dot_general(
            doT_ref[:], vT_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [BQ, BK]
        ds = p * (dp - delta_ref[0, 0, 0][:, None]) * sm_scale
        acc_ref[:] += jax.lax.dot_general(
            kT, ds.astype(kT.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [D, BQ]

    @pl.when(j == num_k_blocks - 1)
    def _finish():
        dqT_ref[:] = acc_ref[:].astype(dqT_ref.dtype)


def _dkv_kernel(lastpad_ref, prefix_ref,
                qT_ref, kT_ref, vT_ref, doT_ref, lse_ref, delta_ref,
                seg_ref, pad_ref, segq_ref, posq_ref,
                dkT_ref, dvT_ref,
                dk_acc_ref, dv_acc_ref,
                *, sm_scale, block_q, block_k, seq_len, num_q_blocks):
    b = pl.program_id(0)
    i = pl.program_id(3)                 # q blocks iterate fastest here

    @pl.when(i == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    j = pl.program_id(2)
    vis = _visible(posq_ref[0, 0], segq_ref[0, 0], seg_ref[0, 0],
                   pad_ref[0, 0], lastpad_ref[b], prefix_ref[b], j,
                   block_q, block_k, seq_len)

    @pl.when(jnp.any(vis))
    def _update():
        qT, kT = qT_ref[:], kT_ref[:]
        doT = doT_ref[:]
        s = jax.lax.dot_general(
            qT, kT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(vis, s, NEG_INF)
        p = jnp.exp(s - lse_ref[0, 0, 0][:, None])            # [BQ, BK]
        # dV_j += dO_i^T-contracted: [D, BK] = doT [D, BQ] @ p [BQ, BK]
        dv_acc_ref[:] += jax.lax.dot_general(
            doT, p.astype(doT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            doT, vT_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0, 0][:, None]) * sm_scale
        dk_acc_ref[:] += jax.lax.dot_general(
            qT, ds.astype(qT.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # [D, BK]

    @pl.when(i == num_q_blocks - 1)
    def _finish():
        dkT_ref[:] = dk_acc_ref[:].astype(dkT_ref.dtype)
        dvT_ref[:] = dv_acc_ref[:].astype(dvT_ref.dtype)


def _pad_and_meta(q, k, v, seg, pad, last_pad, prefix, block_q, block_k):
    B, H, Q, D = q.shape
    S = k.shape[2]
    Sp = ((S + block_k - 1) // block_k) * block_k
    Qp = ((Q + block_q - 1) // block_q) * block_q
    q_positions = jnp.arange(Qp)
    if Qp != Q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
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
    return (q, k, v, seg.astype(jnp.int32), pad.astype(jnp.int32),
            last_pad.astype(jnp.int32), prefix.astype(jnp.int32),
            seg_q.astype(jnp.int32), pos_q.astype(jnp.int32), Qp, Sp)


def _fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q, block_k,
         interpret):
    B, H, Q, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv
    (qp, kp, vp, segp, padp, lp, pf, seg_q, pos_q, Qp, Sp) = _pad_and_meta(
        q, k, v, seg, pad, last_pad, prefix, block_q, block_k)

    qT = jnp.swapaxes(qp, 2, 3)
    kT = jnp.swapaxes(kp, 2, 3)
    vT = jnp.swapaxes(vp, 2, 3)
    nkb = Sp // block_k
    grid = (B, H, Qp // block_q, nkb)

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
        out_specs=[
            pl.BlockSpec((1, 1, D, block_q),
                         lambda b, h, i, j, *_: (b, h, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q),
                         lambda b, h, i, j, *_: (b, h, 0, i)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((D, block_q), jnp.float32),
        ],
    )

    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        seq_len=S, num_k_blocks=nkb)

    def squeeze(lp_r, pf_r, q_r, k_r, v_r, seg_r, pad_r, sq_r, pq_r,
                o_r, lse_r, m_r, l_r, a_r):
        kernel(lp_r, pf_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
               seg_r, pad_r, sq_r, pq_r, o_r.at[0, 0], lse_r, m_r, l_r, a_r)

    outT, lse = pl.pallas_call(
        squeeze,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D, Qp), q.dtype),
                   jax.ShapeDtypeStruct((B, H, 1, Qp), jnp.float32)],
        interpret=interpret,
    )(lp, pf, qT, kT, vT, segp[:, None, :], padp[:, None, :],
      seg_q[:, None, :], pos_q)

    out = jnp.swapaxes(outT, 2, 3)[:, :, :Q, :]
    return out, lse


def _bwd(sm_scale, block_q, block_k, interpret, res, dout):
    q, k, v, seg, pad, last_pad, prefix, out, lse = res
    B, H, Q, D = q.shape
    Hkv, S = k.shape[1], k.shape[2]
    group = H // Hkv
    (qp, kp, vp, segp, padp, lp, pf, seg_q, pos_q, Qp, Sp) = _pad_and_meta(
        q, k, v, seg, pad, last_pad, prefix, block_q, block_k)

    dop = jnp.pad(dout, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    outp = jnp.pad(out, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    delta = jnp.sum(dop.astype(jnp.float32) * outp.astype(jnp.float32),
                    axis=-1)[:, :, None, :]                 # [B, H, 1, Qp]
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, 0),
                         (0, Qp - lse.shape[3])),
                   constant_values=-NEG_INF)

    qT = jnp.swapaxes(qp, 2, 3)
    kT = jnp.swapaxes(kp, 2, 3)
    vT = jnp.swapaxes(vp, 2, 3)
    doT = jnp.swapaxes(dop, 2, 3)
    nqb, nkb = Qp // block_q, Sp // block_k

    shapes = [
        (1, 1, D, block_q),   # qT
        (1, 1, D, block_k),   # kT
        (1, 1, D, block_k),   # vT
        (1, 1, D, block_q),   # doT
        (1, 1, 1, block_q),   # lse
        (1, 1, 1, block_q),   # delta
        (1, 1, block_k),      # seg
        (1, 1, block_k),      # pad
        (1, 1, block_q),      # seg_q
        (1, 1, block_q),      # pos_q
    ]

    def specs(maps):
        return [pl.BlockSpec(s, m) for s, m in zip(shapes, maps)]

    # ---- dq: grid (B, H, i, j), k-blocks fastest
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, nqb, nkb),
        in_specs=specs([
            lambda b, h, i, j, *_: (b, h, 0, i),
            lambda b, h, i, j, *_: (b, h // group, 0, j),
            lambda b, h, i, j, *_: (b, h // group, 0, j),
            lambda b, h, i, j, *_: (b, h, 0, i),
            lambda b, h, i, j, *_: (b, h, 0, i),
            lambda b, h, i, j, *_: (b, h, 0, i),
            lambda b, h, i, j, *_: (b, 0, j),
            lambda b, h, i, j, *_: (b, 0, j),
            lambda b, h, i, j, *_: (b, 0, i),
            lambda b, h, i, j, *_: (0, 0, i),
        ]),
        out_specs=pl.BlockSpec((1, 1, D, block_q),
                               lambda b, h, i, j, *_: (b, h, 0, i)),
        scratch_shapes=[pltpu.VMEM((D, block_q), jnp.float32)],
    )
    dq_kernel = functools.partial(
        _dq_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        seq_len=S, num_k_blocks=nkb)

    def dq_squeeze(lp_r, pf_r, q_r, k_r, v_r, do_r, lse_r, dl_r, seg_r,
                   pad_r, sq_r, pq_r, dq_r, a_r):
        dq_kernel(lp_r, pf_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
                  do_r.at[0, 0], lse_r, dl_r, seg_r, pad_r, sq_r, pq_r,
                  dq_r.at[0, 0], a_r)

    dqT = pl.pallas_call(
        dq_squeeze, grid_spec=dq_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D, Qp), q.dtype),
        interpret=interpret,
    )(lp, pf, qT, kT, vT, doT, lsep, delta, segp[:, None, :],
      padp[:, None, :], seg_q[:, None, :], pos_q)

    # ---- dk/dv: grid (B, H, j, i), q-blocks fastest
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, H, nkb, nqb),
        in_specs=specs([
            lambda b, h, j, i, *_: (b, h, 0, i),
            lambda b, h, j, i, *_: (b, h // group, 0, j),
            lambda b, h, j, i, *_: (b, h // group, 0, j),
            lambda b, h, j, i, *_: (b, h, 0, i),
            lambda b, h, j, i, *_: (b, h, 0, i),
            lambda b, h, j, i, *_: (b, h, 0, i),
            lambda b, h, j, i, *_: (b, 0, j),
            lambda b, h, j, i, *_: (b, 0, j),
            lambda b, h, j, i, *_: (b, 0, i),
            lambda b, h, j, i, *_: (0, 0, i),
        ]),
        out_specs=[
            pl.BlockSpec((1, 1, D, block_k),
                         lambda b, h, j, i, *_: (b, h, 0, j)),
            pl.BlockSpec((1, 1, D, block_k),
                         lambda b, h, j, i, *_: (b, h, 0, j)),
        ],
        scratch_shapes=[pltpu.VMEM((D, block_k), jnp.float32),
                        pltpu.VMEM((D, block_k), jnp.float32)],
    )
    dkv_kernel = functools.partial(
        _dkv_kernel, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        seq_len=S, num_q_blocks=nqb)

    def dkv_squeeze(lp_r, pf_r, q_r, k_r, v_r, do_r, lse_r, dl_r, seg_r,
                    pad_r, sq_r, pq_r, dk_r, dv_r, ka_r, va_r):
        dkv_kernel(lp_r, pf_r, q_r.at[0, 0], k_r.at[0, 0], v_r.at[0, 0],
                   do_r.at[0, 0], lse_r, dl_r, seg_r, pad_r, sq_r, pq_r,
                   dk_r.at[0, 0], dv_r.at[0, 0], ka_r, va_r)

    dkT, dvT = pl.pallas_call(
        dkv_squeeze, grid_spec=dkv_spec,
        out_shape=[jax.ShapeDtypeStruct((B, H, D, Sp), k.dtype),
                   jax.ShapeDtypeStruct((B, H, D, Sp), v.dtype)],
        interpret=interpret,
    )(lp, pf, qT, kT, vT, doT, lsep, delta, segp[:, None, :],
      padp[:, None, :], seg_q[:, None, :], pos_q)

    dq = jnp.swapaxes(dqT, 2, 3)[:, :, :Q, :]
    dk = jnp.swapaxes(dkT, 2, 3)[:, :, :S, :]
    dv = jnp.swapaxes(dvT, 2, 3)[:, :, :S, :]
    if group > 1:
        dk = dk.reshape(B, Hkv, group, S, D).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(B, Hkv, group, S, D).sum(axis=2).astype(v.dtype)
    return dq, dk, dv, None, None, None, None


def _round_block(Q):
    return ((Q + 127) // 128) * 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _attn(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q, block_k,
          interpret):
    out, _ = _fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q,
                  block_k, interpret)
    return out


def _vjp_fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q,
             block_k, interpret):
    out, lse = _fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q,
                    block_k, interpret)
    return out, (q, k, v, seg, pad, last_pad, prefix, out, lse)


def _vjp_bwd(sm_scale, block_q, block_k, interpret, res, dout):
    return _bwd(sm_scale, block_q, block_k, interpret, res, dout)


_attn.defvjp(_vjp_fwd, _vjp_bwd)


def omni_attention_trainable(q, k, v, seg, pad=None, last_pad=None,
                             prefix=None,
                             sm_scale: Optional[float] = None,
                             block_q: int = DEFAULT_BLOCK_Q,
                             block_k: int = DEFAULT_BLOCK_K,
                             interpret: bool = False):
    """Differentiable streaming omni-attention (self-attention, Q == S).

    Same arguments and semantics as
    :func:`showo_tpu.ops.streaming_attention.omni_attention_streaming`
    minus q_positions; gradients flow to q/k/v via flash-style backward
    kernels (no S x S materialization).
    """
    assert q.shape[2] == k.shape[2], "trainable variant is self-attention"
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    bq = min(block_q, _round_block(q.shape[2]))
    return _attn(q, k, v, seg, pad, last_pad, prefix, sm_scale, bq,
                 block_k, interpret)
