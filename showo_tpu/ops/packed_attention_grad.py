"""Trainable PACKED omni-attention: the small/medium-S training kernel.

The streaming trainable kernel (streaming_attention_grad.py) launches a
(B, H, i, j) grid — at the v1 train shape (B=29, H=32, S=387) that is
~3.7k tiny programs per pass and measured SLOWER than XLA dense (7.4 vs
~6 ms/layer fwd).  Yet the round-5 ablation showed dense attention is
*143 ms of the 302 ms* v1 train forward: the S x S fp32 score
materialization + multi-pass softmax dominate the whole tower.

This module restructures the trainable kernels on the inference packed
kernel's plan (flash_attention.py::_attn_kernel_packed):

  * packed [B, S, H*D] layout — the natural projection output, no HBM
    transposes on entry or exit;
  * grid (B, row-blocks): ONE program per row block with a python-level
    head loop — the mask predicate is computed ONCE per block and shared
    by all heads (the per-(b,h) grids recompute it H times);
  * full K/V resident in VMEM per program (the packed kernel's VMEM
    budget: Sp * (HD + 2*KVD) * 2B + fp32 score tiles <= ~16 MB — callers
    route to the streaming kernels past that);
  * forward also emits per-(head,row) logsumexp; backward = flash-style
    dq and dkv kernels with ``dS = P (dP - rowsum(dO*O))``, no S x S in
    HBM, GQA dk/dv accumulated across the q-head group in-kernel.

Same O(S) mask metadata semantics as every other kernel in ops/
(causal | same-segment | prefix, minus pads).  Self-attention (Q == S).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from showo_tpu.ops.masks import NEG_INF


def _mask(posq, segq, seg, pad, last_pad, prefix, block_rows, Sp, seq_len,
          col0: int = 0):
    """Visibility predicate for a row block vs columns [col0, col0+Sp)."""
    rows = posq[:, None] + jnp.zeros((1, Sp), jnp.int32)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (block_rows, Sp), 1)
    vis = cols <= rows
    vis |= (segq[:, None] == seg[None, :]) & (segq[:, None] > 0)
    vis |= cols < prefix
    vis &= (pad[None, :] == 0) | (rows <= last_pad)
    vis &= cols < seq_len
    return vis


def _fwd_kernel(lastpad_ref, prefix_ref,
                q_ref, k_ref, v_ref, seg_ref, pad_ref, segq_ref, posq_ref,
                o_ref, lse_ref,
                *, sm_scale, block_q, seq_len, num_heads, head_dim,
                num_kv_heads):
    b = pl.program_id(0)
    q_all = q_ref[0]                    # [BQ, H*D]
    k_all = k_ref[0]                    # [Sp, Hkv*D]
    v_all = v_ref[0]
    Sp = k_all.shape[0]

    vis = _mask(posq_ref[0, 0], segq_ref[0, 0], seg_ref[0, 0],
                pad_ref[0, 0], lastpad_ref[b], prefix_ref[b],
                block_q, Sp, seq_len)
    bias = jnp.where(vis, 0.0, NEG_INF)

    group = num_heads // num_kv_heads
    for h in range(num_heads):
        lo = h * head_dim
        kv_lo = (h // group) * head_dim
        q = q_all[:, lo:lo + head_dim]
        k = k_all[:, kv_lo:kv_lo + head_dim]
        v = v_all[:, kv_lo:kv_lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale + bias
        m = jnp.max(s, axis=-1)
        m_safe = jnp.where(m <= NEG_INF, 0.0, m)
        p = jnp.exp(s - m_safe[:, None])
        p = jnp.where(vis, p, 0.0)
        l = jnp.sum(p, axis=-1)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out / jnp.where(l == 0.0, 1.0, l)[:, None]
        o_ref[0, :, lo:lo + head_dim] = out.astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, -NEG_INF,
                        m_safe + jnp.log(jnp.maximum(l, 1e-37)))
        lse_ref[0, h, :] = lse


def _dq_kernel(lastpad_ref, prefix_ref,
               q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               seg_ref, pad_ref, segq_ref, posq_ref,
               dq_ref,
               *, sm_scale, block_q, seq_len, num_heads, head_dim,
               num_kv_heads):
    b = pl.program_id(0)
    q_all, k_all, v_all = q_ref[0], k_ref[0], v_ref[0]
    do_all = do_ref[0]
    Sp = k_all.shape[0]

    vis = _mask(posq_ref[0, 0], segq_ref[0, 0], seg_ref[0, 0],
                pad_ref[0, 0], lastpad_ref[b], prefix_ref[b],
                block_q, Sp, seq_len)
    bias = jnp.where(vis, 0.0, NEG_INF)

    group = num_heads // num_kv_heads
    for h in range(num_heads):
        lo = h * head_dim
        kv_lo = (h // group) * head_dim
        q = q_all[:, lo:lo + head_dim]
        k = k_all[:, kv_lo:kv_lo + head_dim]
        v = v_all[:, kv_lo:kv_lo + head_dim]
        do = do_all[:, lo:lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale + bias
        lse = lse_ref[0, h, :]
        lse_safe = jnp.where(lse >= -NEG_INF, 0.0, lse)
        p = jnp.exp(s - lse_safe[:, None])
        p = jnp.where(vis, p, 0.0)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, h, :][:, None]) * sm_scale
        dq = jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, :, lo:lo + head_dim] = dq.astype(dq_ref.dtype)


def _dkv_kernel(lastpad_ref, prefix_ref,
                q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                seg_ref, pad_ref, segq_ref, posq_ref,
                dk_ref, dv_ref,
                dk_acc_ref, dv_acc_ref,
                *, sm_scale, block_q, block_k, seq_len, num_heads,
                head_dim, num_kv_heads, num_q_blocks):
    """Grid (B, k-blocks, q-blocks): one q/do block vs one k/v block per
    step (q blocks iterate fastest, accumulating dk/dv in fp32 scratch);
    mask computed once per tile and shared across the head loop; GQA
    dk/dv summed over the q-head group in-kernel."""
    b = pl.program_id(0)
    jb = pl.program_id(1)
    ib = pl.program_id(2)

    @pl.when(ib == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    q_blk = q_ref[0]                    # [BQ, H*D]
    k_blk = k_ref[0]                    # [BK, Hkv*D]
    v_blk = v_ref[0]
    do_blk = do_ref[0]

    vis_t = _mask(posq_ref[0, 0], segq_ref[0, 0], seg_ref[0, 0],
                  pad_ref[0, 0], lastpad_ref[b], prefix_ref[b],
                  block_q, block_k, seq_len, col0=jb * block_k)  # [BQ, BK]

    @pl.when(jnp.any(vis_t))
    def _update():
        bias = jnp.where(vis_t, 0.0, NEG_INF)
        group = num_heads // num_kv_heads
        for hkv in range(num_kv_heads):
            kv_lo = hkv * head_dim
            k = k_blk[:, kv_lo:kv_lo + head_dim]
            v = v_blk[:, kv_lo:kv_lo + head_dim]
            dk_acc = jnp.zeros((block_k, head_dim), jnp.float32)
            dv_acc = jnp.zeros((block_k, head_dim), jnp.float32)
            for g in range(group):
                h = hkv * group + g
                lo = h * head_dim
                q = q_blk[:, lo:lo + head_dim]
                do = do_blk[:, lo:lo + head_dim]
                s = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) * sm_scale + bias
                lse = lse_ref[0, h, :]
                lse_safe = jnp.where(lse >= -NEG_INF, 0.0, lse)
                p = jnp.exp(s - lse_safe[:, None])            # [BQ, BK]
                p = jnp.where(vis_t, p, 0.0)
                dv_acc += jax.lax.dot_general(
                    p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [BK, D]
                dp = jax.lax.dot_general(
                    do, v, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [BQ, BK]
                ds = p * (dp - delta_ref[0, h, :][:, None]) * sm_scale
                dk_acc += jax.lax.dot_general(
                    ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)       # [BK, D]
            dk_acc_ref[:, kv_lo:kv_lo + head_dim] += dk_acc
            dv_acc_ref[:, kv_lo:kv_lo + head_dim] += dv_acc

    @pl.when(ib == num_q_blocks - 1)
    def _finish():
        dk_ref[0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _prep(q, k, v, seg, pad, last_pad, prefix, block):
    B, S, HD = q.shape
    Sp = ((S + block - 1) // block) * block
    if Sp != S:
        q = jnp.pad(q, ((0, 0), (0, Sp - S), (0, 0)))
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
    pos = jnp.broadcast_to(jnp.arange(Sp, dtype=jnp.int32)[None], (B, Sp))
    return q, k, v, seg.astype(jnp.int32), pad.astype(jnp.int32), \
        last_pad.astype(jnp.int32), prefix.astype(jnp.int32), pos, Sp


def _fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q, H, Hkv,
         interpret):
    B, S, HD = q.shape
    D = HD // H
    KVD = Hkv * D
    q, k, v, seg, pad, last_pad, prefix, pos, Sp = _prep(
        q, k, v, seg, pad, last_pad, prefix, block_q)
    kernel = functools.partial(
        _fwd_kernel, sm_scale=sm_scale, block_q=block_q, seq_len=S,
        num_heads=H, head_dim=D, num_kv_heads=Hkv)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Sp // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, Sp, KVD), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, Sp, KVD), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, Sp), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, *_: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i, *_: (b, 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, H, block_q), lambda b, i, *_: (b, 0, i)),
        ],
    )
    seg_q = seg
    out, lse = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, Sp, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, H, Sp), jnp.float32)],
        interpret=interpret,
    )(last_pad, prefix, q, k, v, seg[:, None, :], pad[:, None, :],
      seg_q[:, None, :], pos[:, None, :])
    return out[:, :S], lse


def _bwd(sm_scale, block_q, H, Hkv, interpret, res, dout):
    q0, k0, v0, seg0, pad0, last_pad0, prefix0, out, lse = res
    B, S, HD = q0.shape
    D = HD // H
    KVD = Hkv * D
    do = dout
    if do.shape[1] != S:
        do = do[:, :S]
    # smaller row blocks than the forward: the dq kernel holds FULL k/v
    # in VMEM on top of its q/do/dq blocks (21 MB at block 256 on the
    # v1 shape — over the 16 MB scoped-vmem stack)
    block_q = min(block_q, 128)
    q, k, v, seg, pad, last_pad, prefix, pos, Sp = _prep(
        q0, k0, v0, seg0, pad0, last_pad0, prefix0, block_q)
    do_p = jnp.pad(do, ((0, 0), (0, Sp - S), (0, 0))) if Sp != S else do
    out_p = jnp.pad(out, ((0, 0), (0, Sp - S), (0, 0))) if Sp != S else out
    # delta[b, h, i] = sum_d dO * O  (per head)
    delta = jnp.transpose(
        jnp.sum((do_p.astype(jnp.float32) * out_p.astype(jnp.float32))
                .reshape(B, Sp, H, D), axis=-1), (0, 2, 1))   # [B, H, Sp]

    common_in = [
        pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),   # q
        pl.BlockSpec((1, Sp, KVD), lambda b, i, *_: (b, 0, 0)),       # k
        pl.BlockSpec((1, Sp, KVD), lambda b, i, *_: (b, 0, 0)),       # v
        pl.BlockSpec((1, block_q, HD), lambda b, i, *_: (b, i, 0)),   # do
        pl.BlockSpec((1, H, block_q), lambda b, i, *_: (b, 0, i)),    # lse
        pl.BlockSpec((1, H, block_q), lambda b, i, *_: (b, 0, i)),    # delta
        pl.BlockSpec((1, 1, Sp), lambda b, i, *_: (b, 0, 0)),         # seg
        pl.BlockSpec((1, 1, Sp), lambda b, i, *_: (b, 0, 0)),         # pad
        pl.BlockSpec((1, 1, block_q), lambda b, i, *_: (b, 0, i)),    # segq
        pl.BlockSpec((1, 1, block_q), lambda b, i, *_: (b, 0, i)),    # posq
    ]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=sm_scale, block_q=block_q,
                          seq_len=S, num_heads=H, head_dim=D,
                          num_kv_heads=Hkv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, Sp // block_q),
            in_specs=common_in,
            out_specs=pl.BlockSpec((1, block_q, HD),
                                   lambda b, i, *_: (b, i, 0))),
        out_shape=jax.ShapeDtypeStruct((B, Sp, HD), q.dtype),
        interpret=interpret,
    )(last_pad, prefix, q, k, v, do_p, lse, delta, seg[:, None, :],
      pad[:, None, :], seg[:, None, :], pos[:, None, :])

    nq = Sp // block_q
    dkv_in = [
        pl.BlockSpec((1, block_q, HD), lambda b, j, i, *_: (b, i, 0)),   # q
        pl.BlockSpec((1, block_q, KVD), lambda b, j, i, *_: (b, j, 0)),  # k
        pl.BlockSpec((1, block_q, KVD), lambda b, j, i, *_: (b, j, 0)),  # v
        pl.BlockSpec((1, block_q, HD), lambda b, j, i, *_: (b, i, 0)),   # do
        pl.BlockSpec((1, H, block_q), lambda b, j, i, *_: (b, 0, i)),    # lse
        pl.BlockSpec((1, H, block_q), lambda b, j, i, *_: (b, 0, i)),    # delta
        pl.BlockSpec((1, 1, block_q), lambda b, j, i, *_: (b, 0, j)),    # seg(k)
        pl.BlockSpec((1, 1, block_q), lambda b, j, i, *_: (b, 0, j)),    # pad(k)
        pl.BlockSpec((1, 1, block_q), lambda b, j, i, *_: (b, 0, i)),    # segq
        pl.BlockSpec((1, 1, block_q), lambda b, j, i, *_: (b, 0, i)),    # posq
    ]
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=sm_scale, block_q=block_q,
                          block_k=block_q, seq_len=S, num_heads=H,
                          head_dim=D, num_kv_heads=Hkv, num_q_blocks=nq),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(B, Sp // block_q, nq),
            in_specs=dkv_in,
            out_specs=[
                pl.BlockSpec((1, block_q, KVD),
                             lambda b, j, i, *_: (b, j, 0)),
                pl.BlockSpec((1, block_q, KVD),
                             lambda b, j, i, *_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, KVD), jnp.float32),
                pltpu.VMEM((block_q, KVD), jnp.float32),
            ]),
        out_shape=[jax.ShapeDtypeStruct((B, Sp, KVD), k.dtype),
                   jax.ShapeDtypeStruct((B, Sp, KVD), v.dtype)],
        interpret=interpret,
    )(last_pad, prefix, q, k, v, do_p, lse, delta, seg[:, None, :],
      pad[:, None, :], seg[:, None, :], pos[:, None, :])

    return (dq[:, :S], dk[:, :S], dv[:, :S], None, None, None, None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _attn(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q, H, Hkv,
          interpret):
    out, _ = _fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q,
                  H, Hkv, interpret)
    return out


def _vjp_fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q, H,
             Hkv, interpret):
    out, lse = _fwd(q, k, v, seg, pad, last_pad, prefix, sm_scale, block_q,
                    H, Hkv, interpret)
    return out, (q, k, v, seg, pad, last_pad, prefix, out, lse)


def _vjp_bwd(sm_scale, block_q, H, Hkv, interpret, res, dout):
    return _bwd(sm_scale, block_q, H, Hkv, interpret, res, dout)


_attn.defvjp(_vjp_fwd, _vjp_bwd)


# VMEM budget for holding full K/V (+ do/q rows in the dkv kernel): the
# packed plan needs ~Sp*(2*HD + 2*KVD)*2B + fp32 tiles under the ~16 MB
# scoped-vmem stack; past this the streaming trainable kernels take over.
PACKED_TRAINABLE_MAX_BYTES = 10 * 1024 * 1024


def packed_trainable_fits(S, num_heads, num_kv_heads, head_dim,
                          block_q: int = 256) -> bool:
    Sp = ((S + block_q - 1) // block_q) * block_q
    HD, KVD = num_heads * head_dim, num_kv_heads * head_dim
    return Sp * (2 * HD + 2 * KVD) * 2 <= PACKED_TRAINABLE_MAX_BYTES


def omni_attention_packed_trainable(
        q, k, v, seg, pad=None, last_pad=None, prefix=None, *,
        num_heads: int, num_kv_heads: Optional[int] = None,
        sm_scale: Optional[float] = None, block_q: int = 256,
        interpret: Optional[bool] = None):
    """Differentiable packed omni-attention (self-attention, Q == S).

    q [B, S, H*D]; k, v [B, S, Hkv*D].  Falls back to the streaming
    trainable kernel when the packed plan exceeds its VMEM budget.
    interpret=None auto-selects interpret mode on CPU backends (the
    virtual-mesh test harness)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, S, HD = q.shape
    if num_kv_heads is None:
        num_kv_heads = num_heads
    D = HD // num_heads
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)
    bq = min(block_q, ((S + 127) // 128) * 128)
    if not packed_trainable_fits(S, num_heads, num_kv_heads, D, bq):
        from showo_tpu.ops.streaming_attention_grad import \
            omni_attention_trainable

        out = omni_attention_trainable(
            jnp.swapaxes(q.reshape(B, S, num_heads, D), 1, 2),
            jnp.swapaxes(k.reshape(B, S, num_kv_heads, D), 1, 2),
            jnp.swapaxes(v.reshape(B, S, num_kv_heads, D), 1, 2),
            seg, pad, last_pad, prefix, sm_scale=sm_scale)
        return jnp.swapaxes(out, 1, 2).reshape(B, S, HD)
    return _attn(q, k, v, seg, pad, last_pad, prefix, sm_scale, bq,
                 num_heads, num_kv_heads, interpret)
