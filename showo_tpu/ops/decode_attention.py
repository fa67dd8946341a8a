"""Pallas fused attention for the prefix-cached MaskGIT decode shape.

During cached MaskGIT (models/showo.py showo_t2i_generate_cached) every
denoise step re-forwards Q ~ 258 image rows attending to the full K ~ 388
sequence.  The FLOPs are trivial (~3 GFLOP/step) but the dense XLA path
materializes fp32 [B, H, Q, K] scores + probs in HBM each layer — about
half the measured step time (tools/probe_decode_breakdown.py).  This
kernel computes scores -> softmax -> PV entirely in VMEM with one program
per (batch, head): at these shapes everything fits (q 33 KB + k/v 50 KB
each + fp32 scores ~0.5 MB).

Mask comes in as the step's additive bias [B, 1, Q, K] (shared across
heads), so every v1 mask quirk is honored exactly — this is a pure
memory-locality optimization, bit-identical math to the dense path
(fp32 scores + fp32 softmax).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale):
    q = q_ref[0, 0]                      # [Qp, D]
    k = k_ref[0, 0]                      # [Kp, D]
    v = v_ref[0, 0]                      # [Kp, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + b_ref[0, 0].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0, 0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _kernel_headloop(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, heads):
    bias32 = b_ref[0, 0].astype(jnp.float32)

    def body(h, _):
        q = q_ref[0, h]                  # [Qp, D]
        k = k_ref[0, h]                  # [Kp, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale + bias32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[0, h] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, heads, body, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("interpret", "per_head_grid"))
def decode_attention(q, k, v, bias, interpret: bool = False,
                     per_head_grid: bool = False):
    """q [B, Q, H, D], k/v [B, K, H, D], bias [B, 1, Q, K] additive.

    Returns [B, Q, H, D]; numerically matches the dense fp32-softmax path.
    """
    B, Q, H, D = q.shape
    K = k.shape[1]
    Qp = _round_up(Q, 8)
    Kp = _round_up(K, 128)

    qh = jnp.swapaxes(q, 1, 2)           # [B, H, Q, D]
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    qh = jnp.pad(qh, ((0, 0), (0, 0), (0, Qp - Q), (0, 0)))
    kh = jnp.pad(kh, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
    vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Kp - K), (0, 0)))
    # padded K columns masked out; padded Q rows are dropped at the end
    bp = jnp.pad(bias.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, Qp - Q), (0, Kp - K)),
                 constant_values=-1e30)

    if per_head_grid:
        out = pl.pallas_call(
            functools.partial(_kernel, scale=1.0 / math.sqrt(D)),
            grid=(B, H),
            in_specs=[
                pl.BlockSpec((1, 1, Qp, D), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Kp, D), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Kp, D), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, Qp, Kp), lambda b, h: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, Qp, D), lambda b, h: (b, h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), q.dtype),
            interpret=interpret,
        )(qh, kh, vh, bp)
    else:
        # one program per batch row, heads unrolled in-kernel: fewer
        # sequential grid programs, k/v/bias resident in VMEM across heads
        out = pl.pallas_call(
            functools.partial(_kernel_headloop, scale=1.0 / math.sqrt(D),
                              heads=H),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H, Qp, D), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, Kp, D), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, H, Kp, D), lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, 1, Qp, Kp), lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, H, Qp, D), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, Qp, D), q.dtype),
            interpret=interpret,
        )(qh, kh, vh, bp)
    return jnp.swapaxes(out[:, :, :Q], 1, 2)
