"""Probe: int8 vs bf16 matmul throughput on the v5e MXU.

Calibrates the quantized-decode lever (STATUS round-2 item): v5e lists
394 TOPS int8 vs 197 TFLOP/s bf16.  Measures the decode-shaped matmul
[rows, 2048] x [2048, N] used by the cached MaskGIT step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=50):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # sync small
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    M, K, N = 1032, 2048, 8192
    key = jax.random.PRNGKey(0)
    a_bf = jax.random.normal(key, (M, K), jnp.bfloat16)
    b_bf = jax.random.normal(key, (K, N), jnp.bfloat16)
    a_i8 = (jax.random.normal(key, (M, K)) * 10).astype(jnp.int8)
    b_i8 = (jax.random.normal(key, (K, N)) * 10).astype(jnp.int8)

    dn = (((1,), (0,)), ((), ()))
    R = 100  # matmuls per jit call: amortizes tunnel dispatch

    def repeat(mm):
        def run(a, b):
            def body(acc, _):
                out = mm(a, b)
                # fold the output back so the loop can't be elided
                return acc + out[0, :8].astype(jnp.float32), None

            acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32),
                                  None, length=R)
            return acc

        return jax.jit(run)

    mm_bf16 = repeat(lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.float32))
    mm_int8 = repeat(lambda a, b: jax.lax.dot_general(
        a, b, dn, preferred_element_type=jnp.int32))
    mm_w8 = repeat(lambda a, b: jax.lax.dot_general(
        a, b.astype(jnp.bfloat16) * jnp.bfloat16(0.05), dn,
        preferred_element_type=jnp.float32))

    flops = 2 * M * K * N * R
    t_bf = bench(mm_bf16, a_bf, b_bf, iters=3)
    t_i8 = bench(mm_int8, a_i8, b_i8, iters=3)
    t_w8 = bench(mm_w8, a_bf, b_i8, iters=3)
    print(f"bf16:  {t_bf*1e6:.1f} us  {flops/t_bf/1e12:.1f} TFLOP/s")
    print(f"int8:  {t_i8*1e6:.1f} us  {flops/t_i8/1e12:.1f} TOP/s "
          f"({t_bf/t_i8:.2f}x vs bf16)")
    print(f"w8dq:  {t_w8*1e6:.1f} us  {flops/t_w8/1e12:.1f} TFLOP/s "
          f"({t_bf/t_w8:.2f}x vs bf16)")


if __name__ == "__main__":
    main()
