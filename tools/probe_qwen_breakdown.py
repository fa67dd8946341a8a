"""Qwen2 tower ablation: where do the 14 ms above the matmul floor go?

probe_v2_breakdown.py measured the 28-layer tower at 39.5 ms vs a
25.2 ms pure-matmul floor at the v2 t2i shape (B=2 CFG, S=986).  This
isolates the non-matmul terms:
  packed      — production inference path (Pallas packed attention)
  dense       — bias-driven einsum attention (fp32 scores in HBM)
  noattn      — attention output replaced by v (skips QK/softmax/PV but
                keeps qkv/o matmuls + norms + rope)
  nonorm      — rms_norm replaced by identity (keeps everything else)
  floor       — qkv/o/mlp matmuls only in the same scan

Run:  python tools/probe_qwen_breakdown.py [unroll=28]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _sync(out):
    import numpy as np

    return float(np.asarray(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32))))


def bench(fn, *args, iters=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    import dataclasses

    from showo_tpu.show_o2 import qwen2 as qmod
    from showo_tpu.show_o2.qwen2 import (Qwen2Config, init_qwen2_params,
                                         qwen2_forward)
    from showo_tpu.show_o2.showo2 import Showo2Config

    unroll = int(args.get("unroll", 28))
    cfg = dataclasses.replace(Showo2Config().llm, scan_unroll=unroll)
    B, S = int(args.get("batch", 2)), int(args.get("seq", 986))
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: init_qwen2_params(cfg, k, jnp.bfloat16))(key)
    params = qmod.fuse_inference(params)
    h = jax.random.normal(key, (B, S, cfg.hidden_size), jnp.bfloat16)
    bias = jnp.zeros((B, 1, S, S), jnp.bfloat16)
    seg = jnp.where((jnp.arange(S) >= 217) & (jnp.arange(S) < 946), 1, 0
                    )[None, :].repeat(B, 0).astype(jnp.int32)
    pad = jnp.zeros((B, S), jnp.int32)
    meta = (seg, pad, jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32))

    iters = int(args.get("iters", 20))

    def tower(p, h, am, b):
        _, last, _ = qwen2_forward(cfg, p, input_embeds=h, attention_bias=b,
                                   attn_meta=am)
        return last

    packed = jax.jit(lambda p, h: tower(p, h, ("pallas_packed",) + meta, None))
    dense = jax.jit(lambda p, h: tower(p, h, None, bias))
    print(f"packed attention:   {bench(packed, params, h, iters=iters):7.2f} ms")
    print(f"dense attention:    {bench(dense, params, h, iters=iters):7.2f} ms")

    # noattn: monkeypatch the attention block away at the module level
    import math as _math
    orig_layer = qmod._layer

    def _layer_noattn(cfg_, lp, h_, bias_, cos, sin, cache_kv=None,
                      cache_index=None, attn_meta=None, attn_impl=None):
        B_, S_, D_ = h_.shape
        H, Hkv, Dh = cfg_.num_heads, cfg_.num_kv_heads, cfg_.head_dim
        x = qmod.rms_norm(h_, lp["input_ln"]["scale"], cfg_.rms_norm_eps)
        qkv = x @ lp["qkv"]["kernel"] + lp["qkv"]["bias"]
        v = qkv[..., (H + Hkv) * Dh:]
        attn = jnp.tile(v, (1, 1, H // Hkv)) @ lp["o"]["kernel"]
        h_ = h_ + attn
        x2 = qmod.rms_norm(h_, lp["post_ln"]["scale"], cfg_.rms_norm_eps)
        return h_ + qmod._mlp(cfg_, lp, x2), (v, v)

    qmod._layer = _layer_noattn
    noattn = jax.jit(lambda p, h: tower(p, h, None, None))
    print(f"noattn:             {bench(noattn, params, h, iters=iters):7.2f} ms")
    qmod._layer = orig_layer

    # nonorm: rms_norm -> identity
    orig_norm = qmod.rms_norm
    qmod.rms_norm = lambda x, scale, eps: x
    nonorm = jax.jit(lambda p, h: tower(p, h, ("pallas_packed",) + meta, None))
    print(f"nonorm (packed):    {bench(nonorm, params, h, iters=iters):7.2f} ms")
    qmod.rms_norm = orig_norm

    # norope
    orig_rope = qmod.apply_rope_full
    qmod.apply_rope_full = lambda q, k, cos, sin: (q, k)
    norope = jax.jit(lambda p, h: tower(p, h, ("pallas_packed",) + meta, None))
    print(f"norope (packed):    {bench(norope, params, h, iters=iters):7.2f} ms")
    qmod.apply_rope_full = orig_rope

    # floor: matmuls only
    def floor_fn(p, h):
        H, Hkv, Dh = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        F = cfg.intermediate_size

        def body(x, lp):
            y = x @ lp["qkv"]["kernel"]
            x = jnp.tile(y[..., (H + Hkv) * Dh:], (1, 1, H // Hkv)
                         ) @ lp["o"]["kernel"]
            gu = x @ lp["gu"]["kernel"]
            x = (gu[..., :F] * gu[..., F:]) @ lp["down"]["kernel"]
            return x, None

        out, _ = jax.lax.scan(body, h, p["layers"], unroll=cfg.scan_unroll)
        return out

    floor = jax.jit(floor_fn)
    print(f"matmul floor:       {bench(floor, params, h, iters=iters):7.2f} ms")


if __name__ == "__main__":
    main()
