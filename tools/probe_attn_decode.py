"""Microbenchmark attention variants at the cached-MaskGIT decode shape
(B=4 with CFG, H=32, Q=258 image rows, K=388 full sequence, D=64).

    python tools/probe_attn_decode.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    return float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())


def bench(fn, *args, iters=50, inner=20):
    """Chain `inner` applications inside ONE jit dispatch (the tunnel's
    per-dispatch latency would otherwise dominate) and average."""
    import functools

    @functools.partial(jax.jit, static_argnums=())
    def chained(q, *rest):
        def body(qc, _):
            out = fn(qc, *rest)
            # feed the output back as q (same shape) to serialize the chain
            return out.astype(qc.dtype), None
        qf, _ = jax.lax.scan(body, q, None, length=inner)
        return qf

    _sync(chained(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters // 5):
        out = chained(*args)
    _sync(out)
    return (time.perf_counter() - t0) / (iters // 5) / inner * 1e3


B, H, Q, K, D = 4, 32, 258, 388, 64
LAYERS = 24  # report per-step cost = per-call x layers


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Q, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, K, H, D)), jnp.bfloat16)
    bias = jnp.asarray(
        np.where(rng.random((B, 1, Q, K)) > 0.1, 0.0, -1e9), jnp.bfloat16)

    import math

    scale = 1.0 / math.sqrt(D)

    def xla_fp32(q, k, v, bias):
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, -1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def xla_bf16(q, k, v, bias):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, -1).astype(v.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v)

    def xla_bhqd(q, k, v, bias):
        # heads-major layout end to end (no bqhd<->bhqk transposes)
        qh = jnp.swapaxes(q, 1, 2)
        kh = jnp.swapaxes(k, 1, 2)
        vh = jnp.swapaxes(v, 1, 2)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias.astype(jnp.float32)
        p = jax.nn.softmax(s, -1).astype(v.dtype)
        return jnp.swapaxes(jnp.einsum("bhqk,bhkd->bhqd", p, vh), 1, 2)

    for name, fn in (("xla fp32-cast (current)", xla_fp32),
                     ("xla bf16 ops / fp32 acc", xla_bf16),
                     ("xla heads-major", xla_bhqd)):
        ms = bench(fn, q, k, v, bias)
        print(f"{name:34s} {ms:6.3f} ms/call  -> {ms*LAYERS:6.2f} ms/step")

    # pallas decode kernel (bias-driven, one program per (b, h))
    from showo_tpu.ops.decode_attention import decode_attention

    for tag, kw in (("pallas decode (b,h) grid", {"per_head_grid": True}),
                    ("pallas decode head-loop", {})):
        fn = (lambda kw: lambda q, k, v, bias: decode_attention(
            q, k, v, bias, **kw))(kw)
        ms = bench(fn, q, k, v, bias)
        print(f"{tag:34s} {ms:6.3f} ms/call  -> {ms*LAYERS:6.2f} ms/step")

    # existing omni kernel at decode shape via metadata-free causal+seg
    from showo_tpu.ops.flash_attention import omni_attention

    seg = jnp.zeros((B, K), jnp.int32).at[:, 130:].set(1)
    qpos = 130 + jnp.arange(Q)
    for bq in (128, 256):
        fn = (lambda bq: lambda q, k, v: jnp.swapaxes(omni_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), seg, q_positions=qpos, block_q=bq),
            1, 2))(bq)
        ms = bench(fn, q, k, v)
        print(f"{'omni kernel block_q=' + str(bq):34s} {ms:6.3f} ms/call"
              f"  -> {ms*LAYERS:6.2f} ms/step")


if __name__ == "__main__":
    main()
