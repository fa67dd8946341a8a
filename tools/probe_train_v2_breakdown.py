"""v2 stage-1 fused train-step decomposition: where does the step go?

Times the pieces of bench.py metric=train_v2 (B=1, S=1024, 432px) in
isolation on the real chip:
  vae       — frozen Wan-VAE encode of the 432px image(s)
  embed     — embed_images (PatchEmbeds + 26-layer SigLIP + fusion) fwd
  embed_g   — grad of embed_images (the und tower trains in stage-1)
  fwd       — full loss forward (no grad)
  grad      — value_and_grad of the loss (remat as given)
  step      — the full fused step (vae + grad + optimizer update)
Implied: bwd = grad - fwd, optimizer+assembly = step - grad - vae.

Run: python tools/probe_train_v2_breakdown.py [remat=full] [batch=1]
     [seq=1024] [opt=adafactor] [attn_impl=dense] [iters=5]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    return float(jnp.asarray(
        jax.tree.leaves(out)[0]).astype(jnp.float32).sum())


def bench(fn, *args, iters=5):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    args = dict(a.split("=", 1) for a in sys.argv[1:])
    from showo_tpu.show_o2.masks import omni_attn_mask
    from showo_tpu.show_o2.showo2 import (Showo2Config, embed_images,
                                          init_showo2_params, showo2_forward)
    from showo_tpu.show_o2.train_stage_one import (Stage1Config,
                                                   make_stage1_optimizer,
                                                   make_stage1_step)
    from showo_tpu.show_o2.transport import Transport
    from showo_tpu.show_o2.wan_vae import (WanVAEConfig, init_wan_vae_params,
                                           wan_encode)

    B = int(args.get("batch", 1))
    L = int(args.get("seq", 1024))
    res = int(args.get("res", 432))
    iters = int(args.get("iters", 5))
    remat = args.get("remat", "full")
    cfg = Showo2Config()
    vae_cfg = WanVAEConfig()
    sc = Stage1Config(optimizer=args.get("opt", "adafactor"),
                      attn_impl=args.get("attn_impl", "dense"),
                      remat=remat)
    params = jax.jit(lambda k: init_showo2_params(cfg, k, jnp.bfloat16))(
        jax.random.PRNGKey(0))
    vae_params = jax.jit(lambda k: init_wan_vae_params(
        vae_cfg, k, jnp.bfloat16))(jax.random.PRNGKey(1))
    jax.block_until_ready((params, vae_params))

    rng = np.random.default_rng(0)
    n_img = cfg.num_image_tokens
    off = L - n_img - 2
    pixels = jnp.asarray(rng.normal(size=(B, res, res, 3)), jnp.float32)
    text_tokens = jnp.asarray(rng.integers(2, 150000, size=(B, L)), jnp.int32)
    text_labels = text_tokens
    mp = jnp.tile(jnp.array([[[off, n_img]]], jnp.int32), (B, 1, 1))
    image_masks = ((jnp.arange(L)[None] >= off)
                   & (jnp.arange(L)[None] < off + n_img)
                   ).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)

    # --- vae encode alone
    @jax.jit
    def vae_fn(vp, px, k):
        x = jnp.transpose(px, (0, 3, 1, 2))[:, :, None]
        return wan_encode(vae_cfg, vp, x, k)[:, :, 0]

    k0 = jax.random.PRNGKey(7)
    ms_vae = bench(vae_fn, vae_params, pixels, k0, iters=iters)
    print(f"vae encode:          {ms_vae:8.1f} ms")
    latents = vae_fn(vae_params, pixels, k0)

    # --- embed_images (siglip) fwd and grad
    emb = jax.jit(lambda p, z: embed_images(cfg, p, z, remat=remat))
    ms_emb = bench(emb, params, latents, iters=iters)
    print(f"embed_images fwd:    {ms_emb:8.1f} ms  (PatchEmbeds + SigLIP-26L"
          f" + fusion at {n_img - 1} tokens)")
    # grad wrt the latents (argnums=1): same backward FLOPs through the
    # tower without materializing a full 2.4B-param grad tree
    emb_g = jax.jit(jax.grad(lambda p, z: embed_images(
        cfg, p, z, remat=remat).astype(jnp.float32).sum(), argnums=1))
    try:
        ms_emb_g = bench(emb_g, params, latents, iters=iters)
        print(f"embed_images grad:   {ms_emb_g:8.1f} ms")
    except Exception as e:  # noqa: BLE001 — keep the rest of the probe
        print(f"embed_images grad:   FAIL {str(e).splitlines()[0][:80]}")

    # --- loss fwd / grad (on fixed latents; xt = latents for timing)
    bias = omni_attn_mask(mp, L)
    t = jnp.full((B,), 0.5, jnp.float32)
    ut = latents

    def loss_fn(p):
        out = showo2_forward(cfg, p, text_tokens, latents, t, bias, mp,
                             text_labels=text_labels, image_labels=ut,
                             image_masks=image_masks, remat=remat)
        return 0.2 * out["loss_ntp"] + out["loss_flow"]

    fwd = jax.jit(loss_fn)
    ms_fwd = bench(fwd, params, iters=iters)
    print(f"loss fwd only:       {ms_fwd:8.1f} ms")

    if args.get("ablate", "0") != "0":
        # forward without the DiT head / without the vocab head
        def fwd_und(p):
            out = showo2_forward(cfg, p, text_tokens, latents, t, bias, mp,
                                 text_labels=text_labels, und_only=True,
                                 remat=remat)
            return out["loss_ntp"]

        ms_und = bench(jax.jit(fwd_und), params, iters=iters)
        print(f"fwd und-only:        {ms_und:8.1f} ms  (DiT head+flow = "
              f"{ms_fwd - ms_und:.1f})")

    grad = jax.jit(jax.grad(loss_fn))
    try:
        ms_grad = bench(grad, params, iters=iters)
        print(f"value_and_grad:      {ms_grad:8.1f} ms  (bwd+remat = "
              f"{ms_grad - ms_fwd:.1f})")
    except Exception as e:  # noqa: BLE001
        print(f"value_and_grad:      FAIL {str(e).splitlines()[0][:90]}")
        ms_grad = None

    # --- full fused step
    opt = make_stage1_optimizer(sc, params)
    opt_state = jax.jit(opt.init)(params)
    transport = Transport(snr_type="lognorm", do_shift=True,
                          seq_len=cfg.num_image_tokens)
    step = make_stage1_step(cfg, vae_cfg, sc, transport, opt)
    batch = {"text_tokens": text_tokens, "text_labels": text_labels,
             "modality_positions": mp, "image_masks": image_masks,
             "images": pixels, "is_und": jnp.zeros((B,), jnp.int32)}
    p2, o2, m = step(params, opt_state, vae_params, batch,
                     jax.random.PRNGKey(2))
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        p2, o2, m = step(p2, o2, vae_params, batch, jax.random.PRNGKey(3 + i))
    float(m["loss"])
    ms_step = (time.perf_counter() - t0) / iters * 1e3
    print(f"full fused step:     {ms_step:8.1f} ms  "
          f"({B / ms_step * 1e3:.2f} samples/s)")
    if ms_grad is not None:
        print(f"residual (opt+corruption): {ms_step - ms_grad - ms_vae:8.1f} ms")


if __name__ == "__main__":
    main()
