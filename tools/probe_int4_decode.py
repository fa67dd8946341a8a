"""Probe: weight-only int4 for BANDWIDTH-bound AR decode.

probe_int8_decode.py showed weight-only int8 + on-read dequant gives
+65%/+72% MMU tok/s (decode streams every layer's weights per token).
int4 halves the weight traffic again IF the 4-bit storage is actually
packed 2/byte in HBM and the unpack fuses into the weight-tile loads.

Variants (same L-layer scan harness as the int8 probe — every iteration
reads a different weight so nothing caches in VMEM):
  bf16          — the floor measurement
  xla int8      — the shipped serving mode (reference point)
  xla int4      — jnp.int4 storage, w.astype(bf16) * scale in the body
                  (XLA TPU packs s4 2/byte; does the unpack fuse?)
  xla nib-pack  — two int4 values per int8 byte, split-halves layout:
                  byte[k, n] holds rows k and k+K/2, so unpack is two
                  shift ops + two half-K matmuls, no interleave
  pallas nib    — the same nibble unpack inside a Pallas kernel (VMEM
                  dequant, fp32 accumulate) if XLA materializes

Run:  python tools/probe_int4_decode.py [rows=8] [layers=24]
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


def _unpack_nib(w8):
    """int8 byte -> (low nibble, high nibble) as sign-extended int8."""
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(w8, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(w8, jnp.int8(4))
    return lo, hi


def _nib_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, k_half):
    # grid over K/2 blocks of the packed bytes; x split-halves layout
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    lo, hi = _unpack_nib(w_ref[...])
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


def pallas_nib_matmul(x, w_pk, scale, block_k=512):
    """x [M, K] bf16 @ unpack(w_pk [K/2, N] bytes, split-halves) -> [M, N].

    Block k of the packed rows covers original rows [k*bk, k*bk+bk) (low
    nibbles) and [K/2 + k*bk, ...) (high nibbles); the x block spec hands
    the kernel both x slices concatenated."""
    M, K = x.shape
    Kh, N = w_pk.shape
    n_k = Kh // block_k
    # re-layout x so block k sees [x_lo_block | x_hi_block] contiguously
    x2 = jnp.concatenate(
        [x[:, :Kh].reshape(M, n_k, block_k),
         x[:, Kh:].reshape(M, n_k, block_k)],
        axis=-1).reshape(M, n_k * 2 * block_k)
    return pl.pallas_call(
        functools.partial(_nib_kernel, n_k=n_k, k_half=Kh),
        grid=(n_k,),
        in_specs=[
            pl.BlockSpec((M, 2 * block_k), lambda k: (0, k)),
            pl.BlockSpec((block_k, N), lambda k: (k, 0)),
            pl.BlockSpec((1, N), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((M, N), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
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
    print(f"bf16 weights:     {t:7.3f} ms  ({gb / t * 1e3:6.0f} GB/s)")

    t = bench(tower(lambda h, wz: dot(h, wz[0].astype(jnp.bfloat16) * wz[1])),
              x, w_i8, scale)
    print(f"xla int8 dequant: {t:7.3f} ms  ({gb / 2 / t * 1e3:6.0f} GB/s eff)")

    try:
        w_i4 = w_nib.repeat(2, axis=1).astype(jnp.int4)  # [L, K, N] s4
        t = bench(tower(lambda h, wz: dot(
            h, wz[0].astype(jnp.bfloat16) * wz[1])), x, w_i4, scale)
        print(f"xla int4 dequant: {t:7.3f} ms  ({gb / 4 / t * 1e3:6.0f} GB/s eff)")
    except Exception as e:  # int4 may be unsupported on this backend
        print(f"xla int4 dequant: unsupported ({type(e).__name__}: {e})")

    def nib_body(h, wz):
        w8, s = wz
        lo, hi = _unpack_nib(w8)
        kh = w8.shape[0]
        y = dot(h[:, :kh], lo.astype(jnp.bfloat16))
        y += dot(h[:, kh:], hi.astype(jnp.bfloat16))
        return y * s.astype(jnp.float32)

    t = bench(tower(nib_body), x, w_nib, scale)
    print(f"xla nib-packed:   {t:7.3f} ms  ({gb / 4 / t * 1e3:6.0f} GB/s eff)")

    try:
        t = bench(tower(lambda h, wz: pallas_nib_matmul(
            h, wz[0], wz[1]).astype(jnp.float32)), x, w_nib, scale)
        print(f"pallas nib:       {t:7.3f} ms  ({gb / 4 / t * 1e3:6.0f} GB/s eff)")
    except Exception as e:
        print(f"pallas nib:       failed ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
