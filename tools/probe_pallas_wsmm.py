"""Probe: Pallas weight-streaming matmul for BANDWIDTH-bound AR decode.

probe_int4_decode.py measured XLA's weight-only int8 dequant path at
1.52 ms for a 24x[8,2048]x[2048,8192] tower = 265 GB/s *effective* (the
int8 bytes move at ~530 GB/s but the ideal halved-traffic time would be
~1.04 ms at the bf16 path's 389 GB/s).  XLA's int4/s4 dtype is broken
(jit recursion) and its nibble unpack doesn't fuse (1.74 ms).  This
probe asks whether a Pallas kernel that streams quantized weight tiles
HBM->VMEM (Pallas grid pipelining double-buffers the tiles) and
dequantizes in-register can approach the traffic floor:

  pallas int8       -- (block_k, block_n) int8 tiles, astype(bf16) in
                       VMEM, fp32 accumulate over k blocks
  pallas int4 (nib) -- two int4 values per int8 byte, split-halves
                       layout (byte[k, n] holds original rows k and
                       k + K/2); unpack via 32-bit shifts (Mosaic
                       cannot legalize 8-bit vector shifts)

Run:  python tools/probe_pallas_wsmm.py [rows=8] [layers=24]
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


# -- int8 weight-streaming matmul ------------------------------------


def _i8_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def pallas_i8_matmul(x, w_i8, scale, block_k=2048, block_n=2048):
    M, K = x.shape
    _, N = w_i8.shape
    n_k, n_n = K // block_k, N // block_n
    return pl.pallas_call(
        functools.partial(_i8_kernel, n_k=n_k),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((M, block_k), lambda n, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
    )(x, w_i8, scale)


# -- int4 nibble-packed weight-streaming matmul ----------------------


def _unpack_nib32(w8):
    """int8 byte -> (low, high) 4-bit values, sign-extended, via i32.

    Mosaic cannot legalize shifts on 8-bit vectors; 32-bit shifts
    legalize fine and the astype stays in-register."""
    w32 = w8.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 28), jnp.int32(28))
    hi = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w32, 24), jnp.int32(28))
    return lo, hi


def _nib_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_nib32(w_ref[...])
    x = x_ref[...]
    bk = lo.shape[0]
    acc_ref[...] += jax.lax.dot_general(
        x[:, :bk], lo.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        x[:, bk:], hi.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[...].astype(jnp.float32)
                      ).astype(o_ref.dtype)


def pallas_nib_matmul(x, w_pk, scale, block_k=1024, block_n=2048):
    """x [M, K] bf16 @ unpack(w_pk [K/2, N], split-halves) -> [M, N].

    Packed row r of block k holds original rows (k*bk + r) low nibble
    and (K/2 + k*bk + r) high nibble; x is re-laid out so the kernel's
    x block is [x_lo_block | x_hi_block]."""
    M, K = x.shape
    Kh, N = w_pk.shape
    n_k, n_n = Kh // block_k, N // block_n
    x2 = jnp.concatenate(
        [x[:, :Kh].reshape(M, n_k, block_k),
         x[:, Kh:].reshape(M, n_k, block_k)],
        axis=-1).reshape(M, n_k * 2 * block_k)
    return pl.pallas_call(
        functools.partial(_nib_kernel, n_k=n_k),
        grid=(n_n, n_k),
        in_specs=[
            pl.BlockSpec((M, 2 * block_k), lambda n, k: (0, k)),
            pl.BlockSpec((block_k, block_n), lambda n, k: (k, n)),
            pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((M, block_n), lambda n, k: (0, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, block_n), jnp.float32)],
    )(x2, w_pk, scale)


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    M = int(args.get("rows", 8))
    L = int(args.get("layers", 24))
    K, N = 2048, 8192
    key = jax.random.PRNGKey(0)
    w_bf = jax.random.normal(key, (L, K, N), jnp.bfloat16)
    w_i8 = (jax.random.normal(key, (L, K, N)) * 10).astype(jnp.int8)
    w_nib = (jax.random.normal(key, (L, K // 2, N)) * 40).astype(jnp.int8)
    scale = jnp.full((L, 1, N), 0.05, jnp.bfloat16)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    gb = L * K * N * 2 / 1e9

    def tower(body):
        def f(x, *ws):
            out, _ = jax.lax.scan(lambda h, w: (body(h, w)[:, :K].astype(
                h.dtype), None), x, ws if len(ws) > 1 else ws[0])
            return out
        return jax.jit(f)

    dot = lambda h, w: jax.lax.dot_general(
        h, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    t = bench(tower(dot), x, w_bf)
    print(f"bf16 weights:        {t:7.3f} ms  ({gb / t * 1e3:6.0f} GB/s)")

    t = bench(tower(lambda h, wz: dot(h, wz[0].astype(jnp.bfloat16) * wz[1])),
              x, w_i8, scale)
    print(f"xla int8 dequant:    {t:7.3f} ms  ({gb / 2 / t * 1e3:6.0f} GB/s eff)")

    # correctness spot-check, then timing sweep over tile shapes
    ref = dot(x, w_i8[0].astype(jnp.bfloat16)) * scale[0].astype(jnp.float32)
    got = pallas_i8_matmul(x, w_i8[0], scale[0])
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"pallas int8 max|err| vs xla: {err:.3f} (bf16 out rounding)")

    for bk, bn in [(2048, 2048), (2048, 4096), (1024, 2048), (512, 2048),
                   (2048, 1024)]:
        try:
            t = bench(tower(lambda h, wz: pallas_i8_matmul(
                h, wz[0], wz[1], block_k=bk, block_n=bn)), x, w_i8, scale)
            print(f"pallas int8 ({bk:4d},{bn:4d}): {t:7.3f} ms  "
                  f"({gb / 2 / t * 1e3:6.0f} GB/s eff)")
        except Exception as e:
            print(f"pallas int8 ({bk:4d},{bn:4d}): failed "
                  f"({type(e).__name__}: {str(e)[:120]})")

    # nibble correctness: build packed bytes from a known int4 matrix
    rng = np.random.default_rng(0)
    w4 = rng.integers(-8, 8, size=(K, N), dtype=np.int8)
    packed = ((w4[K // 2:] << 4) | (w4[:K // 2] & 0x0F)).astype(np.int8)
    ref = dot(x, jnp.asarray(w4, jnp.int8).astype(jnp.bfloat16)
              ) * scale[0].astype(jnp.float32)
    try:
        got = pallas_nib_matmul(x, jnp.asarray(packed), scale[0])
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"pallas nib max|err| vs unpacked: {err:.3f}")
        for bk, bn in [(1024, 2048), (512, 2048), (1024, 4096), (256, 2048)]:
            t = bench(tower(lambda h, wz: pallas_nib_matmul(
                h, wz[0], wz[1], block_k=bk, block_n=bn)), x, w_nib, scale)
            print(f"pallas nib  ({bk:4d},{bn:4d}): {t:7.3f} ms  "
                  f"({gb / 4 / t * 1e3:6.0f} GB/s eff)")
    except Exception as e:
        print(f"pallas nib: failed ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
