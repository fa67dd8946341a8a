"""Finer DiT-head ablation on the packed path: what exactly is the
~6.4 ms between packed (20.2 ms) and the matmul floor (13.8 ms)?

Variants (all scan-structured, unroll=10, v2 t2i shape B=2 S=986):
  packed        — production (packed attention, einsum span modulation)
  packed+nomod  — modulation neutralized to scalars
  packed+nonorm — rms_norm -> identity (input/post/qk norms)
  packed+norope — RoPE skipped
  noattn        — attention replaced by v-passthrough (keeps qkv/o matmuls)
  floor         — 4 matmuls only
  attn-only     — the packed attention call alone, 10x

Run: python tools/probe_dit_fine.py [iters=30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp


def _sync(out):
    import numpy as np

    return float(np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))


def bench(fn, *args, iters=30):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    iters = int(args.get("iters", 30))

    from showo_tpu.show_o2 import dit as ditmod
    from showo_tpu.show_o2.dit import (DiffusionHeadConfig, dit_forward,
                                       init_dit_params)
    from showo_tpu.show_o2 import qwen2 as q2mod

    cfg = dataclasses.replace(DiffusionHeadConfig(), scan_unroll=10)
    B, S = 2, 986
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_dit_params(cfg, k, jnp.bfloat16))(key)
    params = ditmod.fuse_inference(params)
    h = jax.random.normal(key, (B, S, cfg.hidden_size), jnp.bfloat16)
    adaln = jax.random.normal(key, (B, cfg.hidden_size), jnp.bfloat16)
    mp = jnp.tile(jnp.array([[[217, 729]]], jnp.int32), (B, 1, 1))
    seg = jnp.where((jnp.arange(S) >= 217) & (jnp.arange(S) < 946), 1, 0
                    )[None, :].repeat(B, 0).astype(jnp.int32)
    pad = jnp.zeros((B, S), jnp.int32)
    last_pad = jnp.full((B,), S, jnp.int32)
    prefix = jnp.zeros((B,), jnp.int32)
    meta = ("pallas_packed", seg, pad, last_pad, prefix)

    packed = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, None, mp,
                                                 attn_meta=meta))
    print(f"packed:             {bench(packed, params, h, adaln, iters=iters):7.2f} ms")

    # nomod
    orig_sm = ditmod.span_modulation

    def scalar_sm(ada, modality_positions, L, n_chunks=6, full_span=False):
        Bm = modality_positions.shape[0]
        D = ada.shape[1] // n_chunks
        z = jnp.zeros((Bm, 1, D), ada.dtype)
        return [z] * n_chunks, jnp.ones((Bm, 1), bool)

    ditmod.span_modulation = scalar_sm
    nomod = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, None, mp,
                                                attn_meta=meta))
    print(f"packed nomod:       {bench(nomod, params, h, adaln, iters=iters):7.2f} ms")
    ditmod.span_modulation = orig_sm

    # nonorm: neutralize rms_norm (identity passthrough)
    orig_rms = q2mod.rms_norm
    ditmod.rms_norm = lambda x, s, e: x
    nonorm = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, None, mp,
                                                 attn_meta=meta))
    print(f"packed nonorm:      {bench(nonorm, params, h, adaln, iters=iters):7.2f} ms")
    ditmod.rms_norm = orig_rms

    # norope
    orig_rot = ditmod._rotate_half
    ditmod._rotate_half = lambda x: jnp.zeros_like(x)
    norope = jax.jit(lambda p, h, a: dit_forward(cfg, p, h, a, None, mp,
                                                 attn_meta=meta))
    print(f"packed zero-rope:   {bench(norope, params, h, adaln, iters=iters):7.2f} ms")
    ditmod._rotate_half = orig_rot

    # attention alone: 10 applications of the packed kernel at this shape
    from showo_tpu.ops.flash_attention import omni_attention_packed

    H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = jax.random.normal(key, (B, S, H * Dh), jnp.bfloat16)
    k = jax.random.normal(key, (B, S, Hkv * Dh), jnp.bfloat16)
    v = jax.random.normal(key, (B, S, Hkv * Dh), jnp.bfloat16)

    def attn10(q, k, v):
        def body(x, _):
            return omni_attention_packed(x, k, v, seg, pad, last_pad, prefix,
                                         num_heads=H, num_kv_heads=Hkv), None
        out, _ = jax.lax.scan(body, q, None, length=10, unroll=10)
        return out

    a10 = jax.jit(attn10)
    print(f"attn x10 (packed):  {bench(a10, q, k, v, iters=iters):7.2f} ms")

    # floor
    def floor_fn(p, h):
        def body(x, lp):
            y = x @ lp["qkv"]["kernel"]
            x = y[..., :cfg.hidden_size] @ lp["o"]["kernel"]
            gu = x @ lp["gu"]["kernel"]
            x = (gu[..., :cfg.intermediate_size]
                 * gu[..., cfg.intermediate_size:]) @ lp["down"]["kernel"]
            return x, None

        out, _ = jax.lax.scan(body, h, p["layers"], unroll=cfg.scan_unroll)
        return out

    floor = jax.jit(floor_fn)
    print(f"matmul floor:       {bench(floor, params, h, iters=iters):7.2f} ms")


if __name__ == "__main__":
    main()
