"""Fwd+bwd timing: flash custom-VJP kernel vs dense autodiff at the v2
mixed-modal training shape (S=5120, GQA) on the real chip.

    python tools/probe_trainable_attn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=10):
    out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters * 1e3


def run(name, B, H, Hkv, S, D, dense_ok=True):
    from showo_tpu.ops.streaming_attention_grad import omni_attention_trainable

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, S, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, Hkv, S, D)), jnp.bfloat16)
    seg = jnp.zeros((B, S), jnp.int32).at[:, S // 2:].set(1)

    def loss_k(q, k, v):
        return jnp.sum(omni_attention_trainable(q, k, v, seg)
                       .astype(jnp.float32) ** 2)

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2)))
    ms_k = bench(gk, q, k, v)
    line = f"{name:34s} flash-vjp {ms_k:8.2f} ms"

    if dense_ok:
        pos = jnp.arange(S)
        vis = (pos[None, :] <= pos[:, None]) | (
            (seg[:, :, None] == seg[:, None, :]) & (seg[:, :, None] > 0))

        def loss_d(q, k, v):
            kk = jnp.repeat(k, H // Hkv, axis=1)
            vv = jnp.repeat(v, H // Hkv, axis=1)
            s = jnp.einsum("bhqd,bhkd->bhqk", q, kk,
                           preferred_element_type=jnp.float32) / np.sqrt(D)
            s = jnp.where(vis[:, None], s, -1e30)
            p = jax.nn.softmax(s, -1).astype(vv.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", p, vv)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gd = jax.jit(jax.grad(loss_d, argnums=(0, 1, 2)))
        ms_d = bench(gd, q, k, v)
        line += f"   dense {ms_d:8.2f} ms"
    print(line)


def main():
    run("v2 432px  B4 H12 Hkv2 S1024 D128", 4, 12, 2, 1024, 128)
    run("v2 mixed  B4 H12 Hkv2 S5120 D128", 4, 12, 2, 5120, 128)
    run("v2 video  B1 H12 Hkv2 S8192 D128", 1, 12, 2, 8192, 128)
    run("long video B1 H12 Hkv2 S16384", 1, 12, 2, 16384, 128,
        dense_ok=False)


if __name__ == "__main__":
    main()
