"""On-chip validation + timing for the streaming omni-attention kernel.

Compares streaming vs the full-KV kernels vs XLA dense at the shipped
sequence lengths, then pushes past the full-KV VMEM ceiling (v1-layout
full heads at S=8192, where omni_attention_packed's K/V block alone would
need ~42 MB of VMEM).

    python tools/probe_streaming_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jax.tree.leaves(x)[0].astype(jnp.float32).sum())


def bench(fn, *args, iters=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def run_case(name, B, H, Hkv, S, D, *, check_dense=True):
    from showo_tpu.ops.flash_attention import omni_attention
    from showo_tpu.ops.streaming_attention import omni_attention_streaming

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    # half text (causal), half one image span (bidirectional)
    seg = jnp.zeros((B, S), jnp.int32).at[:, S // 2:].set(1)

    stream = jax.jit(lambda q, k, v: omni_attention_streaming(q, k, v, seg))
    ms_s = bench(stream, q, k, v)
    line = f"{name:34s} streaming {ms_s:7.2f} ms"

    if Hkv == H:
        full = jax.jit(lambda q, k, v: omni_attention(q, k, v, seg))
        try:
            ms_f = bench(full, q, k, v)
            line += f"   full-KV {ms_f:7.2f} ms"
        except Exception as e:
            line += f"   full-KV FAILED ({type(e).__name__})"

    if check_dense:
        def dense(q, k, v):
            kk = jnp.repeat(k, H // Hkv, axis=1) if Hkv != H else k
            vv = jnp.repeat(v, H // Hkv, axis=1) if Hkv != H else v
            pos = jnp.arange(S)
            vis = (pos[None, :] <= pos[:, None]) | (
                (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0))
            s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                           preferred_element_type=jnp.float32) / np.sqrt(D)
            s = jnp.where(vis[:, None], s, -1e30)
            p = jax.nn.softmax(s, -1).astype(vv.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, vv)

        jd = jax.jit(dense)
        ms_d = bench(jd, q, k, v)
        line += f"   dense {ms_d:7.2f} ms"
        err = float(jnp.max(jnp.abs(
            stream(q, k, v).astype(jnp.float32)
            - jd(q, k, v).astype(jnp.float32))))
        line += f"   max|err| {err:.3e}"
    print(line)


def main():
    run_case("v1 512^2  B2 H32 S1153 D64", 2, 32, 32, 1153, 64)
    run_case("v2 mixed  B2 H12 Hkv2 S5120 D128", 2, 12, 2, 5120, 128)
    run_case("v2 video  B1 H12 Hkv2 S8192 D128", 1, 12, 2, 8192, 128)
    # dense check off: fp32 scores alone would be 8.6 GB
    run_case("v1-layout B1 H32 S8192 D64", 1, 32, 32, 8192, 64,
             check_dense=False)
    run_case("long video B1 H12 Hkv2 S16384 D128", 1, 12, 2, 16384, 128,
             check_dense=False)


if __name__ == "__main__":
    main()
