"""t2v roofline: where do the 292 s of the suite t2v row go?

Times, on the real chip at the bench shape (1.5B, 432px, T latent
frames, CFG B=2, S = text + T*729 + 1):
  velocity  — one euler velocity eval (the per-step cost x steps)
  matfloor  — the velocity eval's matmul floor (qwen 28L + dit 10L
              weight-stationary matmuls at the same row count)
  vae_full  — full-clip Wan video decode
  vae_strm  — chunked-streaming decode (constant memory; crossover?)

Run: python tools/probe_t2v_breakdown.py [latent_frames=5] [iters=3]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.asarray(jax.tree.leaves(x)[0]).astype(jnp.float32).sum())


def bench(fn, *args, iters=3):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    T = int(args.get("latent_frames", 2))  # 2 = the suite t2v shape
    iters = int(args.get("iters", 3))

    from showo_tpu.ops.flash_attention import seg_from_modality_positions
    from showo_tpu.show_o2.showo2 import (Showo2Config, fuse_inference,
                                          init_showo2_params,
                                          showo2_t2i_velocity)
    from showo_tpu.show_o2.wan_vae import (WanVAEConfig, init_wan_vae_params,
                                           wan_decode, wan_decode_streaming)

    cfg = Showo2Config()
    params = fuse_inference(jax.jit(
        lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0)))
    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(lambda k: init_wan_vae_params(
        vae_cfg, k, jnp.bfloat16))(jax.random.PRNGKey(1))

    per = (cfg.image_latent_height // cfg.patch_size) * \
        (cfg.image_latent_width // cfg.patch_size)
    n_vid = T * per + 1
    text_len = 215
    L = (text_len + n_vid + 127) // 128 * 128
    B = 2  # CFG pair
    off = 16
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(10, 150000, size=(B, L)), jnp.int32)
    mp = jnp.tile(jnp.array([[[off, n_vid]]], jnp.int32), (B, 1, 1))
    seg = seg_from_modality_positions(mp, L)
    impl = args.get("attn", "pallas_packed" if L <= 2816
                    else "pallas_streaming")
    meta = (impl, seg, jnp.zeros((B, L), jnp.int32),
            jnp.full((B,), -1, jnp.int32), jnp.zeros((B,), jnp.int32))
    z = jax.random.normal(jax.random.PRNGKey(2),
                          (B, cfg.image_latent_dim, T,
                           cfg.image_latent_height, cfg.image_latent_width),
                          jnp.bfloat16)

    vel = jax.jit(lambda p, x, t: showo2_t2i_velocity(
        cfg, p, text, x, t, None, mp, guidance_scale=5.0, num_frames=T,
        attn_meta=meta))
    t_half = jnp.full((B,), 0.5, jnp.float32)
    ms_vel = bench(vel, params, z, t_half, iters=iters)
    print(f"velocity eval (T={T}, S={L}): {ms_vel:8.1f} ms "
          f"({ms_vel * 20 / 1e3:.1f} s per 20-step euler)")

    # matmul floor at the same row count: qwen + dit weight streams
    rows = B * L
    qc, dc = cfg.llm, cfg.dit
    x1 = jax.random.normal(jax.random.PRNGKey(3), (rows, qc.hidden_size),
                           jnp.bfloat16)

    def tower_floor(x, ws):
        def body(x, w):
            a, b = w
            return (x @ a)[:, :x.shape[1]] @ b[:x.shape[1], :x.shape[1]], None
        x, _ = jax.lax.scan(body, x, ws)
        return x

    wq = jax.random.normal(jax.random.PRNGKey(4),
                           (qc.num_layers, qc.hidden_size,
                            3 * qc.intermediate_size), jnp.bfloat16) * 0.02
    wq2 = jax.random.normal(jax.random.PRNGKey(5),
                            (qc.num_layers, 3 * qc.intermediate_size,
                             qc.hidden_size), jnp.bfloat16) * 0.02
    fl = jax.jit(tower_floor)
    ms_floor = bench(fl, x1, (wq, wq2), iters=iters)
    gf = rows * qc.num_layers * 2 * (qc.hidden_size * 3 * qc.intermediate_size
                                     + 0) * 2 / 1e12
    print(f"qwen-ish matmul floor:      {ms_floor:8.1f} ms "
          f"({gf / ms_floor * 1e3:.0f} TFLOP/s)")

    dec_full = jax.jit(lambda p, z: wan_decode(vae_cfg, p, z))
    z1 = z[:1]
    ms_vf = bench(dec_full, vae_params, z1, iters=max(1, iters - 1))
    print(f"vae decode full-clip (T={T}): {ms_vf:8.1f} ms")
    dec_s = jax.jit(lambda p, z: wan_decode_streaming(vae_cfg, p, z))
    ms_vs = bench(dec_s, vae_params, z1, iters=max(1, iters - 1))
    print(f"vae decode streaming (T={T}): {ms_vs:8.1f} ms")

    n_pix = 4 * (T - 1) + 1
    total_s = (ms_vel * 20 + ms_vf) / 1e3
    print(f"implied t2v: {n_pix / total_s * 60:.1f} frames/min "
          f"(euler20 + full-clip decode)")


if __name__ == "__main__":
    main()
