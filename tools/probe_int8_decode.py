"""Probe: weight-only int8 for BANDWIDTH-bound decode matvecs.

probe_int8_matmul.py measured int8 neutral at the compute-bound
[1032, 2048] MaskGIT shape.  MMU decode is the opposite regime: Q=1-4
rows, cost = streaming every layer's weights from HBM (the 294 tok/s
floor in STATUS).  Weight-only int8 halves that traffic — IF the
dequant happens in VMEM tiles rather than via a materialized bf16 copy.

Mimics real decode: a lax.scan over L layers' weights (each iteration
reads a DIFFERENT weight array, so nothing caches in VMEM):
  bf16        — the floor measurement
  xla-dequant — int8 weights, w.astype(bf16) * scale inside the body
                (XLA may materialize the bf16 copy: read i8 + write bf16
                + read bf16 = 1.5x the bf16 traffic)
  pallas-i8   — kernel reads int8 tiles, dequants in VMEM, accumulates
                fp32 (the real lever if xla-dequant doesn't fuse)

Run:  python tools/probe_int8_decode.py [rows=4] [layers=24]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(fn, *args, iters=30):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def _i8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    # grid: (K blocks); x [M, bk], w [bk, N], s [1, N] per-channel scales
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def pallas_i8_matmul(x, w_i8, scale, block_k=512, block_n=None):
    """x [M, K] bf16 @ dequant(w_i8 [K, N], scale [1, N]) -> [M, N] bf16."""
    M, K = x.shape
    N = w_i8.shape[1]
    block_n = block_n or N
    n_k = K // block_k
    grid = (n_k,)
    return pl.pallas_call(
        functools.partial(_i8_kernel, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, block_k), lambda k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda k: (k, 0)),
            pl.BlockSpec((1, block_n), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
    )(x, w_i8, scale)


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    M = int(args.get("rows", 8))   # >=8: bf16 sublane tile alignment
    global UNROLL
    UNROLL = int(args.get("unroll", 1))
    L = int(args.get("layers", 24))
    K, N = 2048, 8192          # decode fc shape (phi fused mlp wide matmul)
    key = jax.random.PRNGKey(0)
    w_bf = jax.random.normal(key, (L, K, N), jnp.bfloat16)
    w_i8 = (jax.random.normal(key, (L, K, N)) * 10).astype(jnp.int8)
    scale = jnp.full((L, 1, N), 0.05, jnp.bfloat16)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)

    gb = L * K * N * 2 / 1e9

    def tower_bf(x, ws):
        def body(h, w):
            y = jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y[:, :K].astype(h.dtype), None

        out, _ = jax.lax.scan(body, x, ws, unroll=UNROLL)
        return out

    def tower_xla_i8(x, ws, ss):
        def body(h, wz):
            w, s = wz
            y = jax.lax.dot_general(h, w.astype(jnp.bfloat16) * s,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return y[:, :K].astype(h.dtype), None

        out, _ = jax.lax.scan(body, x, (ws, ss), unroll=UNROLL)
        return out

    def tower_pl_i8(x, ws, ss):
        def body(h, wz):
            w, s = wz
            y = pallas_i8_matmul(h, w, s)
            return y[:, :K], None

        out, _ = jax.lax.scan(body, x, (ws, ss), unroll=UNROLL)
        return out

    t = bench(jax.jit(tower_bf), x, w_bf)
    print(f"bf16 weights:       {t:7.3f} ms  ({gb / t * 1e3:6.0f} GB/s)")
    t = bench(jax.jit(tower_xla_i8), x, w_i8, scale)
    print(f"xla int8 dequant:   {t:7.3f} ms  ({gb / 2 / t * 1e3:6.0f} GB/s eff)")
    t = bench(jax.jit(tower_pl_i8), x, w_i8, scale)
    print(f"pallas int8:        {t:7.3f} ms  ({gb / 2 / t * 1e3:6.0f} GB/s eff)")


if __name__ == "__main__":
    main()
