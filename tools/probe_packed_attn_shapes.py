"""Isolate the packed omni-attention op at the DiT/Qwen t2i shapes:
per-head loop vs GQA-stacked, block_q sweep.  Times ONE attention
application x10 (like 10 DiT layers back to back).

Run: python tools/probe_packed_attn_shapes.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from showo_tpu.ops import flash_attention as fa


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for name, B, S, H, Hkv, D in [("dit", 2, 986, 32, 8, 64),
                                  ("qwen", 2, 986, 12, 2, 128)]:
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (B, S, H * D), jnp.bfloat16)
        k = jax.random.normal(key, (B, S, Hkv * D), jnp.bfloat16)
        v = jax.random.normal(key, (B, S, Hkv * D), jnp.bfloat16)
        seg = jnp.where((jnp.arange(S) >= 217) & (jnp.arange(S) < 946), 1, 0
                        )[None, :].repeat(B, 0).astype(jnp.int32)
        pad = jnp.zeros((B, S), jnp.int32)
        last_pad = jnp.full((B,), -1, jnp.int32)
        prefix = jnp.zeros((B,), jnp.int32)

        def run10(fn):
            @jax.jit
            def f(q, k, v):
                out = q
                for _ in range(10):
                    out = fn(out, k, v)
                return out

            return f

        for bq in (128, 256, 512):
            for stacked in (False, True):
                if stacked and H == Hkv:
                    continue

                def attn(q, k, v, bq=bq, stacked=stacked):
                    if stacked:
                        Sp = (S + bq - 1) // bq * bq
                        qp = jnp.pad(q, ((0, 0), (0, Sp - S), (0, 0)))
                        kp = jnp.pad(k, ((0, 0), (0, Sp - S), (0, 0)))
                        vp = jnp.pad(v, ((0, 0), (0, Sp - S), (0, 0)))
                        segp = jnp.pad(seg, ((0, 0), (0, Sp - S)))
                        padp = jnp.pad(pad, ((0, 0), (0, Sp - S)))
                        qpos = jnp.broadcast_to(jnp.arange(Sp)[None], (B, Sp))
                        return fa._omni_attention_gqa_stacked(
                            qp, kp, vp, segp, padp, last_pad, prefix, qpos,
                            num_heads=H, num_kv_heads=Hkv,
                            sm_scale=D ** -0.5, block_q=bq, S=S,
                            interpret=False)[:, :S]
                    return fa.omni_attention_packed(
                        q, k, v, seg, pad, last_pad, prefix,
                        num_heads=H, num_kv_heads=Hkv, block_q=bq,
                        gqa_stack=False)

                try:
                    ms = bench(run10(attn), q, k, v)
                    print(f"{name}: bq={bq} stacked={int(stacked)}: "
                          f"{ms:7.2f} ms /10-apps")
                except Exception as e:  # noqa
                    print(f"{name}: bq={bq} stacked={int(stacked)}: "
                          f"FAIL {str(e).splitlines()[0][:80]}")


if __name__ == "__main__":
    main()
