"""Show-o2 t2i roofline: where do the 50-step euler milliseconds go?

Times each component of the flow-matching velocity evaluation separately
(full-size 1.5B config, bf16, CFG batch 2, 432px = S 986) plus the
pure-matmul floor of the Qwen2 tower, so STATUS.md can carry a
%-of-ceiling figure for v2 like the v1 decode analysis (VERDICT r2
item 2).  Reference hot loop: show-o2/inference_t2i.py:179-195.

Run on the real chip:  python tools/probe_v2_breakdown.py [fused=1]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def _sync(out):
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    return float(np.asarray(jnp.sum(leaf.astype(jnp.float32))))


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
    from showo_tpu.show_o2.dit import (dit_forward, final_layer_apply,
                                       time_embed_apply)
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.qwen2 import qwen2_forward
    from showo_tpu.show_o2.showo2 import (Showo2Config, embed_images,
                                          fuse_inference, init_showo2_params,
                                          showo2_forward)
    from showo_tpu.show_o2.wan_vae import WanVAEConfig, init_wan_vae_params, wan_decode

    import dataclasses

    cfg = Showo2Config()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, scan_unroll=28),
        dit=dataclasses.replace(cfg.dit, scan_unroll=10))
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    if args.get("fused", "1") != "0":
        params = fuse_inference(params)
    jax.block_until_ready(params)

    B = 2                      # CFG pair
    n_img = cfg.num_image_tokens     # 730 incl. time slot at 432px
    text_len = 256
    L = text_len + n_img
    lat_shape = (B, cfg.image_latent_dim, cfg.image_latent_height,
                 cfg.image_latent_width)
    latents = jax.random.normal(jax.random.PRNGKey(1), lat_shape,
                                jnp.bfloat16)
    text = jax.random.randint(jax.random.PRNGKey(2), (B, L), 10, 150000)
    mp = jnp.broadcast_to(jnp.asarray([[text_len, n_img]], jnp.int32)[None],
                          (B, 1, 2))
    bias = omni_attn_mask(mp.reshape(B, 1, 2), L).astype(jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.float32)

    # 1) full velocity evaluation (one euler step's model cost)
    @jax.jit
    def full_step(params, text, latents, t, bias, mp):
        out = showo2_forward(cfg, params, text, latents, t, bias, mp)
        return out["v_seq"]

    ms_full = bench(full_step, params, text, latents, t, bias, mp)
    print(f"{'velocity eval (one euler step, CFG pair)':46s} {ms_full:8.2f} ms")

    # 2) dual-path image embedding (SigLIP und_trans + gen + fusion)
    @jax.jit
    def embed_only(params, latents):
        return embed_images(cfg, params, latents)

    ms_embed = bench(embed_only, params, latents)
    print(f"{'  embed_images (und 26L SigLIP + gen + fusion)':46s} {ms_embed:8.2f} ms")

    # 3) Qwen2 28-layer tower, last_hidden only (logits DCE'd)
    embeds = jax.random.normal(jax.random.PRNGKey(3),
                               (B, L, cfg.llm.hidden_size), jnp.bfloat16)

    @jax.jit
    def qwen_only(params, embeds, bias):
        _, h, _ = qwen2_forward(cfg.llm, params["showo"],
                                input_embeds=embeds, attention_bias=bias)
        return h

    ms_qwen = bench(qwen_only, params, embeds, bias)
    print(f"{'  qwen2 tower (28L, S=%d, last_hidden)' % L:46s} {ms_qwen:8.2f} ms")

    # 4) DiT head (10 modulated blocks + final layer)
    h_in = jax.random.normal(jax.random.PRNGKey(4),
                             (B, L, cfg.dit.hidden_size), jnp.bfloat16)
    te = jax.random.normal(jax.random.PRNGKey(5), (B, cfg.dit.hidden_size),
                           jnp.bfloat16)

    @jax.jit
    def dit_only(params, h, te, bias, mp):
        h = dit_forward(cfg.dit, params["diffusion_head_a"], h, te, bias, mp)
        return final_layer_apply(params["diffusion_head_b"], h, te, mp)

    ms_dit = bench(dit_only, params, h_in, te, bias, mp)
    print(f"{'  DiT head (10 blocks + final layer)':46s} {ms_dit:8.2f} ms")

    # 5) VAE decode (once per generation, not per step)
    vae_cfg = WanVAEConfig()
    vae_params = jax.jit(
        lambda k: init_wan_vae_params(vae_cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(6))
    z = jax.random.normal(jax.random.PRNGKey(7),
                          (1, cfg.image_latent_dim, 1,
                           cfg.image_latent_height, cfg.image_latent_width),
                          jnp.bfloat16)

    @jax.jit
    def vae_only(vp, z):
        return wan_decode(vae_cfg, vp, z)

    ms_vae = bench(vae_only, vae_params, z, iters=5)
    print(f"{'VAE decode (once per image)':46s} {ms_vae:8.2f} ms")

    # 6) pure-matmul floor of the qwen tower at these shapes
    W = params["showo"]["layers"]
    x0 = jnp.zeros((B * L, cfg.llm.hidden_size), jnp.bfloat16)

    @jax.jit
    def floor(x, W):
        def layer(x, w):
            qkv = x @ (w["qkv"]["kernel"] if "qkv" in w else w["q"]["kernel"])
            y = qkv[:, :cfg.llm.hidden_size] @ w["o"]["kernel"]
            g = x @ (w["gu"]["kernel"] if "gu" in w else w["gate"]["kernel"])
            z = g[:, :cfg.llm.intermediate_size] @ w["down"]["kernel"]
            return x + y + z, None

        x, _ = jax.lax.scan(layer, x, W, unroll=28)
        return x

    ms_floor = bench(floor, x0, W)
    print(f"{'qwen pure-matmul floor (same weights)':46s} {ms_floor:8.2f} ms")
    print(f"qwen/floor = {ms_qwen / ms_floor:.2f}x; "
          f"step = embed {ms_embed / ms_full * 100:.0f}% + "
          f"qwen {ms_qwen / ms_full * 100:.0f}% + "
          f"dit {ms_dit / ms_full * 100:.0f}% "
          f"(residual {100 - (ms_embed + ms_qwen + ms_dit) / ms_full * 100:.0f}%)")
    est = 50 * ms_full + ms_vae
    print(f"50-step estimate: {est:.0f} ms/image-pair -> "
          f"{2 * 60000 / est / 2:.1f} img/min (CFG pair = 1 image)")


if __name__ == "__main__":
    main()
