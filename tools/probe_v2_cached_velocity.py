"""Single-eval A/B: showo2_t2i_velocity (plain) vs _cached (window).

The r4 e2e A/B (tools/probe_t2iv2_cached_ab.py) has cached+full_span
LOSING by ~1.2 ms/step (22.75 vs 23.54 img/min) even though the window
forwards 26% fewer qwen rows and 26% fewer DiT rows — this probe times
the two velocity evaluations and the prefill in isolation (same jit
context, interleaved) to localize where the window's savings leak.

Run: python tools/probe_v2_cached_velocity.py [iters=30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    return float(np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32).sum()))


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

    from showo_tpu.ops.flash_attention import seg_from_modality_positions
    from showo_tpu.show_o2 import showo2 as s2
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.showo2 import (Showo2Config, init_showo2_params,
                                          showo2_t2i_prefill,
                                          showo2_t2i_velocity,
                                          showo2_t2i_velocity_cached)

    cfg = Showo2Config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=28),
        dit=dataclasses.replace(cfg.dit, scan_unroll=10))
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    params = s2.fuse_inference(params)

    B = 2  # CFG pair
    n_img = cfg.num_image_tokens          # 729
    off = 215
    L = 986
    mp = jnp.tile(jnp.asarray([[[off, n_img]]], jnp.int32), (B, 1, 1))
    text = jnp.asarray(
        np.random.default_rng(0).integers(5, 1000, size=(B, L)), jnp.int32)

    seg = seg_from_modality_positions(mp, L)
    meta = ("pallas_packed", seg, jnp.zeros((B, L), jnp.int32),
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32))

    lat = jnp.asarray(np.random.default_rng(1).normal(size=(
        B, cfg.image_latent_dim, cfg.image_latent_height,
        cfg.image_latent_width)), jnp.bfloat16)
    t = jnp.full((B,), 0.4, jnp.float32)

    plain = jax.jit(lambda p, x, tt: showo2_t2i_velocity(
        cfg, p, text, x, tt, None, mp, guidance_scale=0.0, attn_meta=meta))
    print(f"plain velocity:   {bench(plain, params, lat, t, iters=iters):8.2f} ms")

    prefill = jax.jit(lambda p: showo2_t2i_prefill(cfg, p, text, None, mp,
                                                   attn_meta=meta))
    qkv, dkv = prefill(params)
    print(f"prefill (once):   {bench(prefill, params, iters=max(3, iters // 6)):8.2f} ms")

    n = n_img + (1 if cfg.add_time_embeds else 0)
    idx = mp[:, 0, 0][:, None] + jnp.arange(n)
    cached = jax.jit(lambda p, x, tt, qkv, dkv: showo2_t2i_velocity_cached(
        cfg, p, x, tt, None, mp, qkv, dkv, guidance_scale=0.0,
        attn_meta=meta))
    print(f"cached velocity:  {bench(cached, params, lat, t, qkv, dkv, iters=iters):8.2f} ms")

    # same, dense bias instead of packed kernel (isolates kernel-at-
    # rectangular-window inefficiency)
    bias = omni_attn_mask(mp, L)
    bias_fresh = jnp.take_along_axis(bias, idx[:, None, :, None], axis=2)
    plain_d = jax.jit(lambda p, x, tt: showo2_t2i_velocity(
        cfg, p, text, x, tt, bias, mp, guidance_scale=0.0))
    print(f"plain dense:      {bench(plain_d, params, lat, t, iters=iters):8.2f} ms")
    cached_d = jax.jit(lambda p, x, tt, qkv, dkv: showo2_t2i_velocity_cached(
        cfg, p, x, tt, bias_fresh, mp, qkv, dkv, guidance_scale=0.0))
    print(f"cached dense:     {bench(cached_d, params, lat, t, qkv, dkv, iters=iters):8.2f} ms")


if __name__ == "__main__":
    main()
